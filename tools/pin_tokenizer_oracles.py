"""Re-pin the corpus-keyed literal oracles for the two tokenizer
TRAINING gates (text_bpe_train / text_unigram_train).

Training is deterministic but NOT SQL-expressible, so their oracles
are pinned constant tables keyed by a corpus signature
(SUM(n_chars) over documents) with one VALUES branch per known sf —
a hash-checked gate instead of the old rows-only check (VERDICT r9
next-round 6). If the driver ever regenerates testdata, the
signature stops matching, the gate visibly fails, and ONE run of
this tool re-pins both oracles:

    python tools/pin_tokenizer_oracles.py

Paste its output over the _BPE_PIN / _UNI_PIN constants in
queries/llm_extra.py.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1")


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    from cdh_integrate_carbondata2_3_spark.queries.llm_extra import (
        _bpe_ranked, _unigram_ranked)

    spark = (SparkSession.builder.master("local[8]")
             .appName("pin-tokenizer-oracles")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    bpe_pin, uni_pin = {}, {}
    for sf in SFS:
        sig = duckdb.sql(
            f"SELECT SUM(n_chars) FROM '{sf}/documents.parquet'"
        ).fetchone()[0]
        bpe_pin[int(sig)] = _bpe_ranked(spark, sf)
        uni = _unigram_ranked(spark, sf)
        uni_pin[int(sig)] = uni
        print(f"# {sf}: signature={sig}")
    print("\n_BPE_PIN = {")
    for sig, rows in bpe_pin.items():
        print(f"    {sig}: {rows!r},")
    print("}")
    print("\n_UNI_PIN = {")
    for sig, rows in uni_pin.items():
        print(f"    {sig}: {rows!r},")
    print("}")


if __name__ == "__main__":
    main()
