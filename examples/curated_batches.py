"""Round-8 capstone end-to-end: CORPUS → CURATION → TOKENIZER →
TRAINING BATCHES, the complete data path a pretraining run ships:

  1. the 8-stage multimodal curation funnel picks the survivor corpus
     (text exact dedup, image/audio/video real-codec near-dup, CLIP
     gate, source reputation, temperature-quota budget mix);
  2. a unigram-LM tokenizer is trained ON the curated corpus (the
     production order — fit the tokenizer to what you kept);
  3. the survivors are tokenized and packed into fixed 64-subword
     context windows with document-span accounting — the batches a
     trainer consumes.

Prints the window table. The same composition is the registered,
DuckDB-hash-checked `curated_training_batches` query (one WITH block
replays pixels → gates → quotas → lattice DP → spans bit-for-bit).

Run:  python examples/curated_batches.py  [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from multimodal_vector_db_spark.queries.m15_tokenpack import (  # noqa: E402
    q_curated_training_batches,
)
from multimodal_vector_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("curated_batches_example")
    batches = q_curated_training_batches(spark, sf_dir).orderBy("window_id")
    print(f"\ncurated training batches over {sf_dir}:")
    rows = batches.collect()
    print(f"{'window':>7} {'docs':>5} {'first':>6} {'last':>6} {'tokens':>7}")
    for r in rows:
        print(
            f"{r['window_id']:>7} {r['n_docs']:>5} {r['first_doc']:>6} "
            f"{r['last_doc']:>6} {r['n_tokens']:>7}"
        )
    total = sum(r["n_tokens"] for r in rows)
    print(
        f"{len(rows)} windows, {total} subword tokens "
        f"(incl. one EOD per document)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
