"""The round-7 capstone end-to-end: the MULTIMODAL training-data
funnel over the synthetic tables — every document carries four facets
(text + one real P5 image + one real PCM WAV clip + one real Y4M
stream), and a sample is dropped when ANY facet fails its gate:

  0. ingest
  1. text exact dedup          (md5 digest, lowest-id survivor)
  2. image near-dup dedup      (real netpbm decode → dHash56 →
                                banded Hamming join)
  3. audio near-dup dedup      (real WAV decode → 15-bit energy
                                contour → banded Hamming join)
  4. video near-dup dedup      (real Y4M decode → 15-bit block-sum
                                contour → banded Hamming join)
  5. CLIP-score gate           (cross-modal consistency ≥ 0.8;
                                every 4th pair deliberately
                                mismatched — the LAION/DataComp gate)
  6. source-reputation gate    (below-mean sources blocklisted)
  7. temperature budget mix    (per-source weights ∝ sqrt(tokens),
                                Hamilton apportionment of a 16-doc
                                budget — the mT5/UNIMAX mix rule)

Prints the per-stage survivor table — the funnel report every
curation run publishes. The same composition is the registered,
DuckDB-hash-checked `multimodal_training_pipeline` query.

Run:  python examples/multimodal_funnel.py  [sf_dir]  (default sf0.001)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from multimodal_vector_db_spark.queries.m12_curation4 import (  # noqa: E402
    _afp_media,
    _phash_media,
    _vts_media,
)
from multimodal_vector_db_spark.queries.m13_funnel import (  # noqa: E402
    multimodal_funnel,
)
from multimodal_vector_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("multimodal_funnel_example")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").where(
        F.col("doc_id") < 200
    )
    report = multimodal_funnel(
        docs,
        _phash_media(docs),
        _afp_media(docs),
        _vts_media(docs),
    ).orderBy("stage")
    print(f"\nmultimodal training-data funnel over {sf_dir}:")
    rows = report.collect()
    print(f"{'stage':<22}{'docs':>8}{'tokens':>10}{'sources':>9}")
    for r in rows:
        print(
            f"{r['stage_name']:<22}{r['n_docs']:>8}"
            f"{r['n_tokens']:>10}{r['n_sources']:>9}"
        )
    kept = rows[-1]["n_docs"] / max(rows[0]["n_docs"], 1)
    print(f"\nfinal keep rate: {kept:.1%}")
    spark.stop()


if __name__ == "__main__":
    main()
