"""Build the committed BPE fixture (olive_spark/ops/bpe_fixture/) from
a FIXED in-repo corpus — deterministic, no external fetch (VERDICT r12
task #1: 'ship a small self-built vocab fixture').

The corpus mixes the synthetic documents-table vocabulary (so merges
are meaningful on the test tables) with generic English/code filler so
the learned subwords generalize past the 31-word synthetic vocab.
Re-running this script reproduces the fixture byte-for-byte.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from olive_spark.ops.tokenize import save_bpe, train_bpe  # noqa: E402

_DOMAIN = (
    "scan column window order sort part agg value line key join merge "
    "group query a vector hash slow stream filter fast the spark batch "
    "table small data big customer row dup "
)
_FILLER = (
    "the quick brown fox jumps over the lazy dog pack your box with "
    "five dozen liquor jugs how vexingly quick daft zebras jump "
    "sphinx of black quartz judge my vow "
    "partition shuffle broadcast executor driver stage task codegen "
    "parquet arrow schema struct array map decimal timestamp interval "
    "aggregate project exchange exists transform reduce flatten slice "
    "tokenize encoder decoder subword byte pair encoding vocabulary "
    "training corpus document sequence budget mixture sample shard "
    "0 1 2 3 4 5 6 7 8 9 10 42 100 2048 4096 "
    "def return import class self none true false lambda yield async "
)

CORPUS = [_DOMAIN * 8 + _FILLER * 2, _FILLER, _DOMAIN * 3]


def fixture_corpus() -> "list[str]":
    """The fixed in-repo training corpus (also the Zipf-head seed for
    ops.tokenize.synthesize_bpe's deterministic 50k table)."""
    return CORPUS


def build(byte_level: bool = False, distributed: bool = False,
          gpt2: bool = False) -> str:
    """Build one fixture dir; ``distributed`` routes training through
    ops.tokenize.train_bpe_distributed (r14 task #4) — the merge list
    is identical by the parity contract, so the artifacts are
    byte-for-byte the same either way."""
    if gpt2:
        byte_level = True
    vocab_size = 384 if byte_level else 128
    pretok = "gpt2" if gpt2 else "whitespace"
    if distributed:
        from pyspark.sql import SparkSession

        from olive_spark.ops.tokenize import train_bpe_distributed

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", "8")
            .getOrCreate()
        )
        df = spark.createDataFrame(
            [(t,) for t in CORPUS], schema="text string"
        )
        bpe = train_bpe_distributed(
            spark, df, vocab_size=vocab_size, byte_level=byte_level,
            pretokenizer=pretok,
        )
    else:
        bpe = train_bpe(CORPUS, vocab_size=vocab_size,
                        byte_level=byte_level, pretokenizer=pretok)
    out = os.path.join(
        os.path.dirname(__file__), "..", "olive_spark", "ops",
        "bpe_fixture_gpt2" if gpt2
        else ("bpe_fixture_bytes" if byte_level else "bpe_fixture"),
    )
    save_bpe(bpe, out)
    print(f"wrote {out}: vocab={len(bpe['vocab'])} "
          f"merges={len(bpe['merges'])} byte_level={byte_level}")
    return out


if __name__ == "__main__":
    build(byte_level="--byte-level" in sys.argv,
          distributed="--distributed" in sys.argv,
          gpt2="--gpt2" in sys.argv)
