"""Distributed Bloom-filter join prefilter (runtime row-level filtering).

The classic big-join optimization: before shuffling a 100 TB fact table
on its join key, drop every row whose key *cannot* appear in the (already
filtered, much smaller) build side, using a Bloom filter built ON THE
EXECUTORS and shipped as a broadcast bitset. Spark's AQE has a built-in
version (``spark.sql.optimizer.runtime.bloomFilter.enabled``) that
injects itself only into eligible shuffle-join shapes; this module is the
explicit, composable form — usable in front of any downstream operator
(aggregation, window, sink), not just the join Catalyst picked.

Scale design:

* **Build is distributed**: each build-side key contributes k bit
  positions (JVM-side ``xxhash64``); positions aggregate to set bitset
  words with a ``bit_or`` groupBy — the shuffle is on word index
  (≤ m/64 groups), and only the finished bitset words (m bits total,
  e.g. 16 KiB for m=2^17) ever reach the driver.
* **Probe stays vectorized**: positions are computed JVM-side with the
  SAME ``xxhash64`` (no cross-language hash-parity trap); the bitset
  lookup is an Arrow-batched pandas UDF over a numpy array shipped via
  ``SparkContext.broadcast`` — no plan literals, O(1) per row.
* **False positives are safe** (the exact join still runs), false
  negatives are impossible (every build key set its bits) — asserted in
  tests/test_bloom.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def _positions(key: Column, m_bits: int, n_hashes: int) -> list[Column]:
    """k bit positions for a key: xxhash64 salted with the hash index."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("bigint")
        for i in range(n_hashes)
    ]


def bloom_build(
    df: DataFrame, key: str, m_bits: int = 1 << 17, n_hashes: int = 3
) -> np.ndarray:
    """Build the bitset distributed; return it as uint64 words.

    One explode (k rows per key) + one ``bit_or`` groupBy on the word
    index; the driver receives only the ≤ m/64 set words.
    """
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, n_hashes)))
    words = (
        df.select(pos.alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("bigint").alias("__word"),
            # shiftleft's numBits is Column-valued only in SQL form
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))"
            ).alias("__bit"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__bit").alias("__bits"))
        .collect()
    )
    bitset = np.zeros(m_bits // 64, dtype=np.int64)
    for r in words:
        bitset[r["__word"]] = r["__bits"]
    return bitset.view(np.uint64)


def bloom_prefilter(
    probe: DataFrame,
    key: str,
    bitset: np.ndarray,
    m_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> DataFrame:
    """Keep only probe rows whose key passes the Bloom filter.

    Bit positions come from the same JVM-side xxhash64 as the build; the
    broadcast numpy bitset is indexed in one vectorized pandas expression
    per hash.
    """
    sc = probe.sparkSession.sparkContext
    b = sc.broadcast(bitset)

    @pandas_udf("boolean")
    def might_contain(*pos_cols: pd.Series) -> pd.Series:
        bits = b.value
        ok = np.ones(len(pos_cols[0]), dtype=bool)
        for p in pos_cols:
            pv = p.to_numpy(dtype=np.int64)
            ok &= (bits[pv >> 6] >> (pv & 63).astype(np.uint64)) & 1 == 1
        return pd.Series(ok)

    return probe.filter(
        might_contain(*_positions(F.col(key), m_bits, n_hashes))
    )
