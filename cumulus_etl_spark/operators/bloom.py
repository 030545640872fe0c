"""Bloom-filter join pruning — prune a huge probe side against a
compact bit-set of the build side's keys before the exact join.

The scenario this exists for (and the reason a plain broadcast join
doesn't cover it): the build side has too many keys to broadcast as a
hash table (say 100M keys ≈ several GB with row overhead) but its
bloom filter fits easily (100M keys at 10 bits/key ≈ 125 MB; at the
default sizes here, KBs). Spark's own runtime row-group filtering
exposes the same idea only as an internal optimizer rule
(`bloom_filter_agg` is not in the public function registry), so this
is the explicit, composable version:

1. BUILD: for each build-side key, k = ``num_hashes`` positions
   ``pmod(xxhash64(key, seed_i), m_bits)``; explode → distinct →
   OR into ``m_bits/64`` words with ``bit_or`` (one narrow shuffle of
   position ints, output bounded by m_bits/64 rows).
2. The word array is collected to the driver (bounded by the filter
   size — a config constant, NOT data volume — same precedent as the
   IVF k-means seed sample) and shipped as a literal into the probe
   filter, so the probe scan stays a pure whole-stage-codegen
   projection: k xxhash64 calls + k bit tests per row, no join, no
   shuffle.
3. PROBE rows that pass (all k bits set) continue into the exact
   join; false positives are eliminated there, so the END RESULT IS
   EXACT — the bloom stage only sheds probe rows (no false
   negatives by construction).

De-dup'd from the FHIR merge path on purpose: `sinks/merge.py` prunes
by key-range clustering (file skipping); this prunes row-by-row
pre-shuffle. At 100 TB you'd size ``m_bits`` ≈ 10·|keys| and let the
probe-side scan drop 99%+ of rows before the join's Exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shl1(nbits: Column) -> Column:
    """1L << nbits with a Column shift amount (F.shiftleft only takes a
    Python int there)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), nbits.cast("int"))


def _positions(key: Column, m_bits: int, num_hashes: int) -> list[Column]:
    """k independent bit positions per key: xxhash64 seeded by hash index."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(num_hashes)
    ]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> list[int]:
    """Aggregate the build side's keys into a bloom bitmask, returned as
    ``m_bits/64`` longs. Distributed until the final word collect, which
    is bounded by the filter size (1024 longs at the default 64Kbit)."""
    assert m_bits % 64 == 0
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key_col), m_bits, num_hashes))).alias("p")
    ).distinct()
    words = (
        pos.groupBy((F.col("p") / 64).cast("int").alias("w"))
        .agg(
            F.bit_or(_shl1(F.col("p") % 64)).alias("bits")
        )
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for row in words:
        arr[row["w"]] = row["bits"]
    return arr


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bloom_words: list[int],
    num_hashes: int = 4,
) -> DataFrame:
    """Filter the probe side to rows whose key MIGHT be in the bloom
    filter (all k bits set). Pure codegen projection — no shuffle."""
    m_bits = len(bloom_words) * 64
    words = F.lit(bloom_words)
    cond = None
    for p in _positions(F.col(key_col), m_bits, num_hashes):
        word = F.element_at(words, (p / 64).cast("int") + 1)
        bit = _shl1(p % 64)
        test = word.bitwiseAND(bit) != 0
        cond = test if cond is None else (cond & test)
    return probe.filter(cond)


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> DataFrame:
    """Exact inner equi-join with a bloom pre-prune of the probe side.
    Result is identical to ``probe.join(build, key_col)`` — the bloom
    stage only reduces the rows that reach the join's shuffle."""
    words = build_bloom(build.select(key_col), key_col, m_bits, num_hashes)
    return bloom_prune(probe, key_col, words, num_hashes).join(build, key_col)
