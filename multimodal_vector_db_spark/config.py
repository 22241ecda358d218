"""Engine configuration with dotted-path access (SURVEY §2.7 F10 —
``config.py:77-101`` of the reference): ``get('index.metric')``
traverses nested dicts; ``set`` creates intermediate levels. Driver-side
only — query plans never read this at execution time."""

from __future__ import annotations

import json
from typing import Any

DEFAULTS: dict[str, Any] = {
    "index": {"metric": "cosine", "dimension": 512, "use_fp16": False},
    "search": {"k": 10, "over_fetch": 1},
    "embedder": {"device": "cpu", "space": "clip"},
}


class EngineConfig:
    def __init__(self, values: dict[str, Any] | None = None):
        self._values = json.loads(json.dumps(DEFAULTS))  # deep copy
        for key, val in (values or {}).items():
            self.set(key, val) if "." in key else self._values.update(
                {key: val}
            )

    def get(self, dotted: str, default: Any = None) -> Any:
        node: Any = self._values
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        node = self._values
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def to_dict(self) -> dict[str, Any]:
        return json.loads(json.dumps(self._values))

    # -- persistence (composes with CorpusStorage.save_config) ---------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self._values, f, indent=2, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "EngineConfig":
        with open(path) as f:
            cfg = cls()
            cfg._values = json.load(f)
            return cfg
