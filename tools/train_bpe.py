"""Regenerate operators/bpe.PINNED_MERGES from the documents corpus.

Usage: python tools/train_bpe.py [sf_dir] [n_merges]
Prints the Python literal to paste into operators/bpe.py.  Pinning (not
training per-query) is the production contract: a tokenizer is a frozen
artifact, and the DuckDB twin needs the identical table.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from scholarmind_spark import get_spark
    from scholarmind_spark.operators.bpe import bpe_train

    spark = get_spark(app_name="train-bpe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train(docs, "text", n_merges=n_merges)
    print("PINNED_MERGES: list[tuple[str, str]] = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")


if __name__ == "__main__":
    main()
