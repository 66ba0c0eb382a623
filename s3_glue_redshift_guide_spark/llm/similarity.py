"""L3 — similarity search over embedding columns.

* ``topk_bruteforce`` — exact cosine top-k: query set x corpus join with a
  per-query window top-k. Correct at any scale where |queries| x |corpus|
  compares are affordable (batch scoring, eval sets); the corpus never
  shuffles — the (small) query side broadcasts.
* ``lsh_topk`` — the scale path: random-hyperplane LSH. Each vector gets a
  b-bit signature (sign of dot with b fixed hyperplanes); candidates are
  corpus vectors sharing a signature band with the query, re-ranked
  exactly. Hyperplanes derive deterministically from a seed so results are
  reproducible run-to-run.

Both use the sequential-fold vector primitives (functions/vectors.py) —
JVM expressions, no UDFs, bit-stable across engines for the oracle.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window as W, functions as F

from ..functions.vectors import cosine, dot, l2_norm
from .dedup import _materialize


def _spread(df: DataFrame) -> DataFrame:
    """Full-width fan-out for the VECTOR operators — deliberately NOT
    the byte-capped ``dedup._spread`` (r12, measured): these call sites
    feed stages whose per-row work is multiplied by a broadcast factor
    (the ADC scan folds one distance-table lookup chain per QUERY per
    row; the salted pair join scores O(occupancy²) pairs), so a width
    derived from input bytes under-provisions them. Measured at sf1
    with the byte cap (width 21 instead of 32, salts 3 instead of 4):
    semantic_dedup_pairs 13.2 -> 21.7 s, pq_topk 3.3 -> 4.2 s,
    ivfpq_topk 5.3 -> 6.7 s — reverted to defaultParallelism here while
    the featurization paths (work ∝ bytes) keep the sweep-validated
    cap. At cluster scale this is the same no-op-ish rebalance as
    always."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)

#: quantizer-training observability: every Lloyd round (coarse k-means
#: or PQ codebook) increments ``lloyd_rounds``. The persisted-index
#: probe path (llm/ann_index.py) pins this at ZERO — the fact that
#: separates "loads the banked quantizer" from "silently retrains".
TRAIN_METRICS = {"lloyd_rounds": 0}


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (self-matches excluded).

    Ranking key is (rounded cosine DESC, neighbor id ASC): rounding to 6
    decimals makes the rank stable across engines' last-ulp float noise,
    and the id tiebreak makes it total.
    """
    # norms hoisted BELOW the join (r11): cosine(qv, cv) re-folds both
    # vector norms per PAIR; computing them in the side projections (the
    # join node blocks CollapseProject, so they stay per-row) drops the
    # per-pair work from three 64-element folds to one. Same sequential
    # folds in the same order — cos_sim stays bit-identical.
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = _spread(corpus).select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-free; only the sign is used)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def _signature(vec_col, planes: list[list[float]]):
    bits = [
        F.when(dot(vec_col, F.array(*[F.lit(x) for x in p])) > 0, 1).otherwise(0)
        for p in planes
    ]
    sig = F.lit(0).cast("bigint")
    for i, b in enumerate(bits):
        sig = sig + (b.cast("bigint") * F.lit(1 << i))
    return sig


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: bucket join on hyperplane-signature bands, exact re-rank
    within candidates. Recall grows with bands; compares drop from |Q|x|C|
    to |Q| x (bucket size) — the curve that matters at 10^9 vectors."""
    planes = hyperplanes(dim, n_planes, seed)
    width = n_planes // bands
    mask = (1 << width) - 1

    def banded(df, id_alias, norm_alias):
        sig = _signature(F.col(vec_col), planes)
        # barrier: the band explode reads __sig per band; without it
        # CollapseProject inlines the n_planes dot products per read.
        # The L2 norm rides the same barrier (r11): computed once per
        # VECTOR here instead of re-folded per candidate pair below —
        # 8 extra bytes per band row buys back two 64-element folds per
        # collision.
        return _materialize(
            df.select(
                F.col("*"),
                sig.alias("__sig"),
                l2_norm(F.col(vec_col)).alias(norm_alias),
            )
        ).select(
            F.col(id_alias[0]).alias(id_alias[1]),
            F.col(vec_col).alias(id_alias[2]),
            norm_alias,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.shiftright("__sig", i * width)
                            .bitwiseAND(F.lit(mask))
                            .alias("key"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select(id_alias[1], id_alias[2], norm_alias, "bk.band", "bk.key")

    qb = banded(queries, (query_id, "query_id", "qv"), "__qn")
    cb = banded(_spread(corpus), (corpus_id, "neighbor_id", "cv"), "__cn")
    # Score in the band join's projection, THEN dedup on the three scalar
    # columns: a (query, neighbor) pair colliding in b bands is re-scored b
    # times (64 multiplies each — cheap, and deterministic so the copies are
    # identical), but the distinct exchange moves 24-byte rows instead of
    # two 64-float vectors (~512 B/row) — the term that dominates shuffle
    # volume at 10^9 vectors.
    scored = (
        qb.join(cb, ["band", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cos_sim"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _centroid_frame(spark, cents: list[list[float]]):
    """Centroids as DATA, not plan literals: one row holding one
    ``array<struct<list_id:int, cent:array<double>>>`` column, meant to be
    broadcast-attached (1-row nested-loop, the scalar-attach idiom) to the
    frame being assigned. Keeps the compiled plan O(1) in k*dim — the
    literal-tree alternative builds ~k*dim expression nodes, which at
    realistic IVF scale (k=4096, dim=768) is ~3M plan nodes and blows up
    compile time and driver memory long before the data does. The struct
    array is sorted by list_id so its layout is deterministic. Each
    centroid's L2 norm rides the struct (r11): folded once per CENTROID
    at frame build instead of once per (row, centroid) in every
    assignment pass — same sequential fold over the same doubles, so
    the assignment distances stay bit-identical."""
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    cdf = spark.createDataFrame(rows, "list_id int, cent array<double>")
    return cdf.select(
        "list_id", "cent", l2_norm(F.col("cent")).alias("cn")
    ).agg(
        F.array_sort(
            F.collect_list(F.struct("list_id", "cent", "cn"))
        ).alias("__cents")
    )


def _nearest_slice(vec_col: str, n_keep: int, vn_col: str = "__avn"):
    """Expression: the ``n_keep`` nearest centroids of ``__cents`` to
    ``vec_col``, as an array of (d, list_id) structs sorted by (distance,
    list_id) — identical ordering semantics (and bit-identical distances)
    to the former literal-tree form, just folded over the broadcast data
    column instead of k inline expressions.

    ``vn_col`` is the row's L2 norm, computed ONCE per row in a
    projection BELOW the centroid cross-join (the join node blocks
    CollapseProject, so the fold can't be re-inlined per centroid); the
    centroid norms are banked in the ``__cents`` structs. Each distance
    is therefore ONE fold (the dot) — down from three in the original
    cosine() form, same arithmetic in the same order
    (dot / (|v| * |c|)), so assignments are bit-identical."""
    dists = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            (
                -(
                    dot(F.col(vec_col), c["cent"])
                    / (F.col(vn_col) * c["cn"])
                )
            ).alias("d"),
            c["list_id"].alias("list_id"),
        ),
    )
    return F.slice(F.array_sort(dists), 1, n_keep)


def kmeans_centroids(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 2,
    use_arrow: bool = True,
) -> list[list[float]]:
    """Distributed Lloyd's k-means for the IVF coarse quantizer.

    Deterministic init (first ``k`` corpus vectors by id); each round
    assigns every vector to its nearest centroid by cosine (centroids ride
    a 1-row broadcast as a data column — see ``_centroid_frame`` — so the
    plan stays O(1) in k*dim) and recomputes per-cluster per-dimension
    means via posexplode + groupBy. Only k*dim scalars reach the driver
    per round — the corpus itself never does, which is the shape that
    holds at 10^9 vectors. Centroid components round to 6 decimals so
    partial-aggregation order can't leak last-ulp noise into assignments.
    """
    cents = [
        [float(x) for x in r["cv"]]
        for r in corpus.orderBy(corpus_id)
        .limit(k)
        .select(F.col(vec_col).alias("cv"))
        .collect()
    ]
    # spread BEFORE the rounds (r11): on a one-file local corpus the
    # assignment pass otherwise runs single-threaded interpreted folds
    # (the same serialization _spread exists for; at cluster scale the
    # corpus already has thousands of splits and this is a cheap
    # rebalance). Summation-order changes in the per-cluster means are
    # absorbed by the documented round-6 convention — the same
    # convention that keeps llm_embed_centroids hash-identical to
    # DuckDB's differently-ordered avg.
    corpus = _spread(corpus)
    for _ in range(iters):
        TRAIN_METRICS["lloyd_rounds"] += 1
        if use_arrow:
            # Arrow assignment kernel (r12, guide §4.2): bit-identical
            # winners, numpy-vectorized distances — see _nearest_kernel
            vec_type = dict(corpus.dtypes)[vec_col]
            assigned = corpus.select(
                F.col(vec_col).alias("__v")
            ).mapInPandas(
                _nearest_kernel(cents, "__v", 1, False),
                schema=f"__v {vec_type}, list_id int",
            ).select("list_id", F.posexplode("__v").alias("pos", "v"))
        else:
            # two selects: a generator in the same projection as the
            # struct field access makes Catalyst re-plan the struct with
            # anonymous fields (col1/col2), losing the list_id name
            assigned = corpus.withColumn(
                "__avn", l2_norm(F.col(vec_col))
            ).crossJoin(
                F.broadcast(_centroid_frame(corpus.sparkSession, cents))
            ).select(
                F.element_at(_nearest_slice(vec_col, 1), 1)["list_id"]
                .alias("list_id"),
                F.col(vec_col).alias("__v"),
            ).select("list_id", F.posexplode("__v").alias("pos", "v"))
        means = (
            assigned.groupBy("list_id", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
            .collect()
        )
        by_list: dict[int, dict[int, float]] = {}
        for r in means:
            by_list.setdefault(r["list_id"], {})[r["pos"]] = r["m"]
        cents = [
            [vals[p] for p in sorted(vals)] if (vals := by_list.get(i)) else c
            for i, c in enumerate(cents)  # empty cluster keeps its centroid
        ]
    return cents


def _nearest_kernel(cents, vec_col: str, n_keep: int, norm: bool):
    """mapInPandas kernel for the coarse-quantizer assignment (r12,
    guide §4.2): the O(n*L) distance evaluation — the measured dominant
    superlinear term of the whole ANN family (BENCH_NOTES.md decade
    probe: exponent 0.89/decade at constant per-list occupancy) — moves
    from one interpreted JVM fold per (row, centroid) to numpy ops
    vectorized ACROSS rows while looping ACROSS dimensions, so every
    fp64 operation happens in exactly the order of the expression fold:

    * JVM ``dot``: zip_with products, then fold ``acc + x_d*y_d`` for
      d=0..dim-1  ->  numpy ``acc = acc + v[:, d] * c[d]`` per d.
    * JVM ``l2_norm``: fold ``acc + x_d*x_d`` then SQRT  ->  same loop,
      ``np.sqrt`` (both are IEEE-754 correctly-rounded).
    * distance ``-(dot / (vn * cn))``: same multiply/divide/negate
      order, elementwise.
    * ``array_sort`` over struct<d, list_id> with list_id ascending on
      ties  ->  stable argsort on d (list_id IS the column order, so
      stability == the tiebreak; NaN sorts last in both engines).

    Elements cast float32 -> float64 BEFORE arithmetic, exactly like
    ``as_double``. Assignments are therefore bit-identical to the
    ``_nearest_slice`` expression path — pinned by
    tests/test_round12_opt.py on real data at two SFs, plus the oracle
    rows. (The r11 Arrow experiment that LOST shipped both 256-byte
    vectors per candidate PAIR — 36M pairs at sf1; this kernel ships
    each vector ONCE per assignment pass, so the boundary cost is O(n)
    while the saved interpreted work is O(n*L).)

    Centroids travel in the function closure (k*dim doubles — the
    pickled command Spark already broadcasts per stage), so the Arrow
    path doesn't need the ``_centroid_frame`` cross-join at all."""
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)  # k x dim
    k, dim = C.shape
    # centroid norms: the same sequential fold _centroid_frame banks
    cn = np.zeros(k)
    for d in range(dim):
        cn = cn + C[:, d] * C[:, d]
    cn = np.sqrt(cn)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            vecs = np.stack(
                [np.asarray(v, dtype=np.float32) for v in pdf[vec_col]]
            ).astype(np.float64)
            acc = np.zeros(n)
            for d in range(dim):
                acc = acc + vecs[:, d] * vecs[:, d]
            vn = np.sqrt(acc)
            with np.errstate(divide="ignore", invalid="ignore"):
                D = np.empty((n, k))
                for j in range(k):
                    cj = C[j]
                    accd = np.zeros(n)
                    for d in range(dim):
                        accd = accd + vecs[:, d] * cj[d]
                    D[:, j] = -(accd / (vn * cn[j]))
            nearest = np.argsort(D, axis=1, kind="stable")[:, :n_keep]
            out = pdf.iloc[
                np.repeat(np.arange(n), nearest.shape[1])
            ].reset_index(drop=True)
            out["list_id"] = nearest.astype(np.int32).ravel()
            if norm:
                out["__avn"] = np.repeat(vn, nearest.shape[1])
            yield out

    return fn


def _nearest_lists(df, cents, vec_col, id_out, vec_out, n_keep,
                   norm_out=None, use_arrow: bool = True):
    """Attach each row's ``n_keep`` nearest centroid ids as an exploded
    column — the IVF assignment pass. Default path (r12): the Arrow
    kernel above — one Python boundary crossing per row instead of
    n_lists interpreted distance folds, bit-identical assignments. The
    expression path (``use_arrow=False``) is retained as the parity
    reference: centroids ride a 1-row broadcast as a data column
    (``_centroid_frame`` — plan size O(1) in k*dim); the frame is
    materialized so the explode can't re-inline the distance
    expressions per reference. With ``norm_out`` the row's L2 norm
    rides along (r11): computed once per vector for the downstream
    candidate scoring instead of re-folded per candidate pair."""
    if use_arrow:
        sel = df.select(F.col(id_out[0]).alias(id_out[1]),
                        F.col(vec_col).alias(vec_out))
        vec_type = dict(sel.dtypes)[vec_out]
        id_type = dict(sel.dtypes)[id_out[1]]
        schema = f"{id_out[1]} {id_type}, {vec_out} {vec_type}, list_id int"
        if norm_out:
            schema += ", __avn double"
        assigned = _materialize(
            sel.mapInPandas(
                _nearest_kernel(cents, vec_out, n_keep, bool(norm_out)),
                schema=schema,
            )
        )
        out_cols = [id_out[1], vec_out] + ([norm_out] if norm_out else [])
        if norm_out:
            assigned = assigned.withColumnRenamed("__avn", norm_out)
        return assigned.select(*out_cols, "list_id")
    withc = df.withColumn("__avn", l2_norm(F.col(vec_col))).crossJoin(
        F.broadcast(_centroid_frame(df.sparkSession, cents))
    )
    extra = [F.col("__avn").alias(norm_out)] if norm_out else []
    withd = _materialize(
        withc.select(
            F.col("*"),
            _nearest_slice(vec_col, n_keep).alias("__near"),
            *extra,
        ).drop("__cents", "__avn")
    )
    out_cols = [id_out[1], vec_out] + ([norm_out] if norm_out else [])
    return withd.select(
        F.col(id_out[0]).alias(id_out[1]),
        F.col(vec_col).alias(vec_out),
        *([F.col(norm_out)] if norm_out else []),
        F.explode("__near").alias("__n"),
    ).select(*out_cols, F.col("__n.list_id").alias("list_id"))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 2,
) -> DataFrame:
    """IVF-flat ANN: a k-means coarse quantizer partitions the corpus into
    ``n_lists`` inverted lists; each query probes its ``n_probe`` nearest
    lists and re-ranks exactly within them.

    The DISTRIBUTED SHAPE is what matters at 10^9 vectors: quantizer
    training moves k*dim scalars per round, corpus assignment is one
    broadcast-map pass, the search join touches only n_probe/n_lists of
    the corpus per query, and nothing is O(|Q|x|C|). ``kmeans_iters=0``
    degrades to the first-k-by-id quantizer.
    """
    cents = kmeans_centroids(corpus, corpus_id, vec_col, n_lists, kmeans_iters)
    cb = _nearest_lists(
        _spread(corpus), cents, vec_col, (corpus_id, "neighbor_id"), "cv", 1,
        norm_out="__cn",
    )
    qb = _nearest_lists(
        queries, cents, vec_col, (query_id, "query_id"), "qv", n_probe,
        norm_out="__qn",
    )
    scored = (
        qb.join(cb, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cos_sim"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _pairscore_kernel(threshold: float, id_field: str = "id",
                      vec_field: str = "v", norm_field: str = "__vn"):
    """mapInPandas kernel scoring ALL co-resident pairs of each inverted
    list in numpy (r12, guide §8 "decide with small rows / move bytes
    once"): each vector crosses the Python boundary ONCE per probe
    assignment (~520 B/row), and the per-list pair grid is computed with
    per-dimension outer-product accumulation — the same fp64 op in the
    same order as the JVM fold, so every dot is bit-identical. (The r11
    Arrow experiment that LOST shipped both vectors per PAIR through
    Arrow — 36M x 512 B at sf1; this ships n x n_probe rows, three
    orders of magnitude less.)

    Rounding mirrors Spark's round(double, 6) exactly: Catalyst routes
    doubles through BigDecimal.valueOf (Double.toString, the shortest
    round-trip decimal) then setScale(6, HALF_UP); Python's repr() is
    the same shortest-round-trip decimal and Decimal.quantize(...,
    ROUND_HALF_UP) the same rounding. Only near-threshold survivors pay
    the per-value Decimal cost — a raw cosine below threshold - 1e-6
    cannot round up to the threshold (round moves a value by at most
    5e-7), so the O(pairs) mask stays vectorized. Equality with the
    fold path is pinned on real data at two SFs by
    tests/test_round12_opt.py plus the oracle rows."""
    import numpy as np

    def score(batches):
        import pandas as pd
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        blk = 512  # row-block: bounds the temp to ~cache size
        for _, g in pdf.groupby("list_id", sort=False):
            n = len(g)
            if n < 2:
                continue
            # sort by id so index order == id order: only the upper
            # triangle (j > i) is ever computed — half the flops and
            # memory traffic of the full grid, and (id_a < id_b) comes
            # free from the indices
            g = g.sort_values(id_field, kind="mergesort")
            ids = g[id_field].to_numpy()
            vn = g[norm_field].to_numpy(dtype=np.float64)
            V = np.stack(
                [np.asarray(x, dtype=np.float32) for x in g[vec_field]]
            ).astype(np.float64)
            out_a, out_b, out_c = [], [], []
            for i0 in range(0, n - 1, blk):
                i1 = min(i0 + blk, n)
                D = np.zeros((i1 - i0, n - i0))
                for d in range(V.shape[1]):
                    D = D + V[i0:i1, d][:, None] * V[i0:, d][None, :]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cs = D / (
                        vn[i0:i1][:, None] * vn[i0:][None, :]
                    )
                ia, ja = np.nonzero(
                    (cs >= threshold - 1e-6)
                    & (
                        np.arange(i0, i1)[:, None]
                        < np.arange(i0, n)[None, :]
                    )
                )
                for i, j in zip(ia.tolist(), ja.tolist()):
                    r = float(
                        Decimal(repr(cs[i, j])).quantize(
                            q6, rounding=ROUND_HALF_UP
                        )
                    )
                    if r >= threshold:
                        out_a.append(ids[i0 + i])
                        out_b.append(ids[i0 + j])
                        out_c.append(r)
            if out_a:
                yield pd.DataFrame(
                    {"id_a": out_a, "id_b": out_b, "cos_sim": out_c}
                )

    return score


def semantic_dedup_pairs(
    corpus: DataFrame,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_lists: int = 8,
    n_probe: int = 3,
    kmeans_iters: int = 2,
    use_arrow: bool = True,
) -> DataFrame:
    """Embedding near-duplicate pairs over the FULL corpus via cluster
    scoping (the SemDeDup shape): a k-means coarse quantizer assigns every
    vector to its ``n_probe`` nearest lists, candidate pairs are vectors
    sharing a list, and candidates re-score exactly — emitted pairs all
    truly clear ``threshold`` (precision 1 by construction); recall is set
    by how often a near-dup pair co-occurs in a probed list (>1 probe
    catches pairs straddling a cluster boundary).

    Scale shape: compares ~ sum over lists of per-list co-residents, never
    corpus² — the all-pairs ``embedding_near_dup`` is the bounded-slice
    demo; THIS is the 10^9-vector path. The pair-dedup distinct keys on
    (id, id, cos) scalars, so no vector payload rides the exchange (same
    discipline as ``lsh_topk``)."""
    cents = kmeans_centroids(corpus, corpus_id, vec_col, n_lists, kmeans_iters)
    assigned = _nearest_lists(
        _spread(corpus), cents, vec_col, (corpus_id, "id"), "v", n_probe,
        norm_out="__vn",
    )
    if use_arrow:
        # Per-list kernel scoring (r12, default): one shuffle of the
        # assigned rows keyed on list_id (explicit width so AQE's
        # size-based coalescing can't serialize the tiny-bytes/huge-work
        # stage), then the whole pair grid of each list scores in numpy
        # — see _pairscore_kernel for the bit-identity argument. The
        # fold path below remains the parity reference
        # (use_arrow=False). Local parallelism is bounded by n_lists
        # (one list is indivisible in this shape) — at production
        # sizing n_lists >= cores, the same regime where the fold
        # path's salting retires; measured sf1 (8 lists / 32 cores,
        # i.e. the kernel's WORST parallelism case): 13.0 -> 3.9 s
        # min-of-3, pair set + cos_sim bit-identical at every SF.
        par = corpus.sparkSession.sparkContext.defaultParallelism
        idt = dict(assigned.dtypes)["id"]
        return (
            assigned.repartition(par, "list_id")
            .mapInPandas(
                _pairscore_kernel(threshold),
                schema=f"id_a {idt}, id_b {idt}, cos_sim double",
            )
            .distinct()
        )
    # Salted self-join (r11, guide's low-cardinality-key treatment): the
    # join key has only n_lists distinct values, so a plain shuffle join
    # caps the pair-scoring parallelism at n_lists tasks — at n_lists=8
    # on 32 cores, 3/4 of the machine idles through the dominant stage.
    # The left side salts on a hash of its id; the right side replicates
    # once per salt, so every co-resident (a, b) pair still meets EXACTLY
    # once and the emitted pair set is identical. Scale-adaptive: salts =
    # ceil(cores / n_lists), so a production quantizer with n_lists >=
    # cores gets salts=1 — no replication, the exact unsalted plan.
    # Salt width stays keyed to defaultParallelism (r12: a byte-capped
    # width was tried per VERDICT-r11 #7 and REVERTED on measurement —
    # the scoring stage's work is O(per-list occupancy²), which a
    # bytes-of-input signal underestimates; capping salts 4 -> 3 at sf1
    # cost 13.2 -> 21.7 s on this operator).
    par = corpus.sparkSession.sparkContext.defaultParallelism
    salts = max(1, -(-par // max(1, n_lists)))
    a_salt = (
        [F.pmod(F.xxhash64("id"), F.lit(salts)).alias("__salt")]
        if salts > 1
        else []
    )
    b_salt = (
        [
            F.explode(
                F.array(*[F.lit(s).cast("bigint") for s in range(salts)])
            ).alias("__salt")
        ]
        if salts > 1
        else []
    )
    join_keys = ["list_id"] + (["__salt"] if salts > 1 else [])
    a = assigned.select(
        "list_id",
        F.col("id").alias("id_a"),
        F.col("v").alias("va"),
        F.col("__vn").alias("__na"),
        *a_salt,
    )
    b = assigned.select(
        "list_id",
        F.col("id").alias("id_b"),
        F.col("v").alias("vb"),
        F.col("__vn").alias("__nb"),
        *b_salt,
    )
    # Scoring stays a JVM fold DELIBERATELY (r11 measured experiment):
    # an Arrow pandas_udf with strict sequential accumulation (bitwise-
    # equal to the fold, proven on 90k-pair cross joins) was prototyped
    # and REJECTED — shipping both 256-byte vectors per pair through
    # Arrow cost more than the interpreted fold it replaced (sf1, 36M
    # pairs: 60.2 s udf vs 37.2 s fold; the threshold filter also stops
    # pushing into the join condition once a udf is in the expression).
    return (
        a.join(b, join_keys)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


# ------------------------- product quantization (PQ) -------------------
def _l2sq(a, b):
    """Squared L2 between two double arrays — sequential fold, bit-stable."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_argmin_codes(S, C):
    """Per-row nearest-codeword index within ONE subspace, replicating
    the expression path bit-for-bit: distances are ``round(_l2sq, 6)``
    and the winner is the (rounded distance, code) struct-sort minimum.

    numpy computes the RAW squared distances with the fold's exact
    per-dimension accumulation order. Rounding can move a value by at
    most 5e-7, so the rounded argmin can differ from the raw argmin
    only when a competitor's raw distance sits within ~1e-6 of the raw
    minimum — those rare rows (ties included, broken by code order)
    fall back to the exact rounding Spark applies
    (BigDecimal.valueOf == Double.toString, then HALF_UP — mirrored by
    ``Decimal(repr(x))``). Everything else stays vectorized."""
    import numpy as np
    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("0.000001")
    n = S.shape[0]
    k = C.shape[0]
    D = np.zeros((n, k))
    for j in range(k):
        cj = C[j]
        acc = np.zeros(n)
        for d in range(S.shape[1]):
            t = S[:, d] - cj[d]
            acc = acc + t * t
        D[:, j] = acc
    best = np.argmin(D, axis=1)  # ties: lowest code (argmin is first)
    m0 = D[np.arange(n), best]
    close = (D <= (m0[:, None] + 2.01e-6)).sum(axis=1)
    for i in np.nonzero(close > 1)[0].tolist():
        cand = np.nonzero(D[i] <= m0[i] + 2.01e-6)[0]
        best[i] = min(
            (
                Decimal(repr(D[i, j])).quantize(
                    q6, rounding=ROUND_HALF_UP
                ),
                j,
            )
            for j in cand.tolist()
        )[1]
    return best


def _pq_assign_kernel(cents, m: int, d: int):
    """mapInPandas kernel assigning every subspace slice of every row to
    its nearest codeword — replaces the interpreted per-point
    filter(128 structs) + 16 ``_l2sq`` folds of the expression path
    (r12, guide §4.2; same bit-identity discipline as
    ``_nearest_kernel``). Input rows carry the raw vector; all m
    subspace codes compute in one boundary crossing. Emits the codes
    array per row."""
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)  # m x k_codes x d

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float32) for v in pdf["__vec"]]
            ).astype(np.float64)
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                codes[:, j] = _pq_argmin_codes(
                    V[:, j * d : (j + 1) * d], C[j]
                )
            yield pdf.assign(codes=list(codes))

    return fn


def _pq_slices(vec_col, m: int, d: int):
    """The m contiguous d-dim subvectors of ``vec_col`` (1-based slice)."""
    return [
        F.slice(F.col(vec_col).cast("array<double>"), j * d + 1, d)
        for j in range(m)
    ]


def pq_codebooks(
    corpus: DataFrame,
    dim: int,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    use_arrow: bool = True,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks (Jégou et al., PQ): split ``dim``
    into ``m`` subspaces and learn ``k_codes`` centroids in each — ALL
    subspaces trained in the SAME Lloyd rounds by tagging every slice
    point with its subspace id, so the round count (and driver traffic:
    m*k_codes*d scalars per round) does not grow with m.

    Deterministic init (slices of the first ``k_codes`` vectors by id);
    squared-L2 assignment; means rounded to 6 dp so partial-agg order
    can't leak into assignments. Returns ``cents[sub][code] -> [d floats]``.
    """
    d = dim // m
    init = [
        [float(x) for x in r["v"]]
        for r in corpus.orderBy(corpus_id)
        .limit(k_codes)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    ]
    cents = [
        [init[c][j * d : (j + 1) * d] for c in range(k_codes)]
        for j in range(m)
    ]
    # spread before slicing (r11): same single-partition serialization
    # fix as kmeans_centroids — the sliced points otherwise train the
    # codebooks on one core on a one-file local corpus
    spread = _spread(corpus)
    if not use_arrow:
        pts = spread.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(j).alias("sub"), s.alias("sl"))
                        for j, s in enumerate(_pq_slices(vec_col, m, d))
                    ]
                )
            ).alias("p")
        ).select(F.col("p.sub").alias("sub"), F.col("p.sl").alias("sl"))
    vec_type = dict(corpus.dtypes)[vec_col]
    for _ in range(iters):
        TRAIN_METRICS["lloyd_rounds"] += 1
        if use_arrow:
            # PQ assignment kernel (r12, guide §4.2): all m subspace
            # codes per vector in ONE boundary crossing, numpy-
            # vectorized with fold-order arithmetic and exact rounded
            # tie handling — see _pq_assign_kernel / _pq_argmin_codes.
            # The slice values the means need re-derive in codegen'd
            # JVM slices below (cheap), so the kernel ships only the
            # vector and the codes.
            coded = spread.select(
                F.col(vec_col).alias("__vec")
            ).mapInPandas(
                _pq_assign_kernel(cents, m, d),
                schema=f"__vec {vec_type}, codes array<int>",
            )
            assigned = coded.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(j).alias("sub"),
                                F.element_at("codes", j + 1).alias(
                                    "code"
                                ),
                                F.slice(
                                    F.col("__vec").cast(
                                        "array<double>"
                                    ),
                                    j * d + 1,
                                    d,
                                ).alias("sl"),
                            )
                            for j in range(m)
                        ]
                    )
                ).alias("p")
            ).select(
                "p.sub", "p.code", F.posexplode("p.sl").alias("pos", "v")
            )
        else:
            cdf = _pq_cent_frame(corpus.sparkSession, cents)
            assigned = (
                pts.crossJoin(F.broadcast(cdf))
                .select(
                    "sub",
                    "sl",
                    F.element_at(
                        F.array_sort(
                            F.transform(
                                F.filter(
                                    F.col("__pqc"),
                                    lambda c: c["sub"] == F.col("sub"),
                                ),
                                lambda c: F.struct(
                                    F.round(
                                        _l2sq(F.col("sl"), c["cent"]), 6
                                    ).alias("d"),
                                    c["code"].alias("code"),
                                ),
                            )
                        ),
                        1,
                    )["code"].alias("code"),
                )
                .select("sub", "code", F.posexplode("sl").alias("pos", "v"))
            )
        means = (
            assigned.groupBy("sub", "code", "pos")
            .agg(F.round(F.avg("v"), 6).alias("mv"))
            .collect()
        )
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            got.setdefault((r["sub"], r["code"]), {})[r["pos"]] = r["mv"]
        cents = [
            [
                [vals[p] for p in sorted(vals)]
                if (vals := got.get((j, c)))
                else cents[j][c]  # empty cluster keeps its centroid
                for c in range(k_codes)
            ]
            for j in range(m)
        ]
    return cents


def _pq_cent_frame(spark, cents):
    """Codebooks as DATA (1-row broadcastable
    ``array<struct<sub:int, code:int, cent:array<double>>>`` sorted by
    (sub, code) so flat index = sub*k + code) — same O(1)-plan discipline
    as ``_centroid_frame``; m*k_codes*d literals would bloat the compiled
    plan at realistic scale (m=96, k=256, d=8)."""
    rows = [
        (j, c, cents[j][c])
        for j in range(len(cents))
        for c in range(len(cents[j]))
    ]
    cdf = spark.createDataFrame(rows, "sub int, code int, cent array<double>")
    return cdf.agg(
        F.array_sort(F.collect_list(F.struct("sub", "code", "cent"))).alias(
            "__pqc"
        )
    )


def pq_encode(
    df: DataFrame,
    cents,
    id_col: str,
    vec_col: str = "embedding",
    out_id: str = "neighbor_id",
    use_arrow: bool = True,
) -> DataFrame:
    """Compress each vector to its m nearest-codeword indices — the
    8-byte-per-vector representation the candidate scan reads INSTEAD of
    the raw embeddings (64x smaller at m=8 codes vs 64 floats). Default
    path (r12): the PQ assignment kernel — one boundary crossing per
    vector, bit-identical codes (see _pq_assign_kernel); the expression
    path is the retained parity reference."""
    m, k_codes = len(cents), len(cents[0])
    d = len(cents[0][0])
    if use_arrow:
        sel = df.select(
            F.col(id_col).alias(out_id), F.col(vec_col).alias("__vec")
        )
        idt = dict(sel.dtypes)[out_id]
        vec_type = dict(sel.dtypes)["__vec"]
        return sel.mapInPandas(
            _pq_assign_kernel(cents, m, d),
            schema=f"{out_id} {idt}, __vec {vec_type}, codes array<int>",
        ).select(out_id, "codes")
    withc = df.crossJoin(
        F.broadcast(_pq_cent_frame(df.sparkSession, cents))
    )
    codes = F.array(
        *[
            F.element_at(
                F.array_sort(
                    F.transform(
                        F.slice(F.col("__pqc"), j * k_codes + 1, k_codes),
                        lambda c: F.struct(
                            F.round(_l2sq(s, c["cent"]), 6).alias("d"),
                            c["code"].alias("code"),
                        ),
                    )
                ),
                1,
            )["code"]
            for j, s in enumerate(_pq_slices(vec_col, m, d))
        ]
    )
    return withc.select(F.col(id_col).alias(out_id), codes.alias("codes"))


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    n_candidates: int = 30,
    kmeans_iters: int = 2,
) -> DataFrame:
    """PQ-compressed ANN top-k (the memory-bound scale path): corpus
    vectors compress to m codeword indices; each query scans CODES with
    an asymmetric-distance lookup table (m adds per candidate instead of
    dim multiplies), takes its ``n_candidates`` best, and re-ranks only
    those exactly by cosine.

    Scale shape: the candidate scan reads the 8-byte code column — at
    10^9x768-dim corpus that is ~8 GB instead of ~3 TB of floats — and
    the distance table (m*k_codes doubles per query) is MATERIALIZED on
    the tiny query side before the scan join so Catalyst cannot re-inline
    the table build per candidate row (which would silently restore
    exact-scan cost). Raw vectors are touched only for the n_candidates
    re-rank join."""
    d = dim // m
    cents = pq_codebooks(
        corpus, dim, corpus_id, vec_col, m, k_codes, kmeans_iters
    )
    codes = pq_encode(_spread(corpus), cents, corpus_id, vec_col)
    qtab = _materialize(
        queries.crossJoin(
            F.broadcast(_pq_cent_frame(queries.sparkSession, cents))
        ).select(
            F.col(query_id).alias("query_id"),
            F.col(vec_col).alias("qv"),
            # query norm hoisted into the barrier (r11): the exact
            # re-rank folds it once per QUERY here instead of once per
            # candidate pair
            l2_norm(F.col(vec_col)).alias("__qn"),
            F.transform(
                F.col("__pqc"),
                lambda c: F.round(
                    _l2sq(
                        F.slice(
                            F.col(vec_col).cast("array<double>"),
                            c["sub"] * d + 1,
                            d,
                        ),
                        c["cent"],
                    ),
                    6,
                ),
            ).alias("dtab"),
        )
    )
    adc = (
        F.broadcast(qtab.drop("qv"))
        .crossJoin(codes)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    F.lit(0.0),
                    lambda acc, j: acc
                    + F.element_at(
                        F.col("dtab"),
                        j * k_codes + F.element_at(F.col("codes"), j + 1) + 1,
                    ),
                ),
                6,
            ).alias("adc"),
        )
    )
    # the candidate window shuffles 20-byte scalar rows; qv re-attaches
    # from the broadcast query side only for the bounded re-rank
    wc = W.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    # the candidate frame is MATERIALIZED: it now has TWO consumers (the
    # norm semi-join below + the re-rank join), and without the barrier
    # each consumer re-derives it — i.e. the whole ADC scan + candidate
    # window runs twice, the exact cost the PQ design exists to avoid
    cand = _materialize(
        adc.withColumn("__r", F.row_number().over(wc))
        .filter(F.col("__r") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    # candidate-scoped corpus norms (r12, VERDICT-r11 #3): the corpus-side
    # L2 norm used to fold once per candidate PAIR in the re-rank
    # projection (a neighbor serving many queries re-folded its norm per
    # query). The semi-join scopes the norm projection to the surviving
    # candidates — never the full corpus, so sparse candidate sets don't
    # regress — and the projection sits below the re-rank join (the join
    # node blocks CollapseProject), so each surviving neighbor folds its
    # norm exactly once. Same fold, same order: cos_sim bit-identical.
    cvn = _spread(corpus).select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).join(
        cand.select("neighbor_id").distinct(), "neighbor_id", "left_semi"
    ).select("neighbor_id", "cv", l2_norm(F.col("cv")).alias("__cn"))
    exact = cand.join(
        F.broadcast(qtab.select("query_id", "qv", "__qn")), "query_id"
    ).join(cvn, "neighbor_id").select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("cv"))
            / (F.col("__qn") * F.col("__cn")),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    n_candidates: int = 60,
    kmeans_iters: int = 2,
) -> DataFrame:
    """IVF-PQ ANN (the FAISS IVFPQ composition — the actual 10^9-vector
    path): the coarse quantizer bounds WHICH corpus rows each query
    touches (an equi-join on ``list_id`` — no cross join anywhere in the
    operator plan), and PQ codes bound WHAT each touched row costs (m
    lookup-adds over an 8-byte code instead of dim float multiplies).
    Exact cosine re-rank of the per-query ADC top-``n_candidates``.

    The candidate scan frame carries (list_id, neighbor_id, codes) — no
    raw vector rides the probe join; vectors are touched only by the
    final bounded re-rank join. Classic (non-residual) PQ codebooks: at
    n_probe/n_lists coverage the residual refinement changes recall by
    little and keeps both quantizers independently testable."""
    cents = kmeans_centroids(corpus, corpus_id, vec_col, n_lists, kmeans_iters)
    pq = pq_codebooks(corpus, dim, corpus_id, vec_col, m, k_codes, kmeans_iters)

    c_lists = _nearest_lists(
        _spread(corpus), cents, vec_col, (corpus_id, "neighbor_id"), "cv", 1
    ).select("neighbor_id", "list_id")
    codes = pq_encode(_spread(corpus), pq, corpus_id, vec_col)
    corpus_scan = c_lists.join(codes, "neighbor_id")
    corpus_vecs = _spread(corpus).select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    return ivfpq_search(
        queries, corpus_scan, corpus_vecs, cents, pq, dim,
        query_id=query_id, vec_col=vec_col, k=k,
        n_probe=n_probe, n_candidates=n_candidates,
    )


def ivfpq_search(
    queries: DataFrame,
    corpus_scan: DataFrame,
    corpus_vecs: DataFrame,
    cents: list[list[float]],
    pq,
    dim: int,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    n_candidates: int = 60,
) -> DataFrame:
    """The IVF-PQ SEARCH given a trained quantizer and an encoded
    corpus — shared verbatim between ``ivfpq_topk`` (trains + encodes
    in-query) and the persisted-index probe path (``llm/ann_index.py``
    loads both from snapshot-table sidecars), so the two can never
    rank differently. ``corpus_scan`` carries (neighbor_id, list_id,
    codes); ``corpus_vecs`` carries (neighbor_id, cv) and is touched
    only by the bounded exact re-rank — probing it from the LIVE table
    is what drops deleted vectors out of persisted-index results."""
    m, k_codes = len(pq), len(pq[0])
    d = dim // m
    q_lists = _nearest_lists(
        queries, cents, vec_col, (query_id, "query_id"), "qv", n_probe
    ).select("query_id", "list_id")
    qtab = _materialize(
        queries.crossJoin(
            F.broadcast(_pq_cent_frame(queries.sparkSession, pq))
        ).select(
            F.col(query_id).alias("query_id"),
            F.col(vec_col).alias("qv"),
            # query norm hoisted into the barrier (r11): the exact
            # re-rank folds it once per QUERY here instead of once per
            # candidate pair
            l2_norm(F.col(vec_col)).alias("__qn"),
            F.transform(
                F.col("__pqc"),
                lambda c: F.round(
                    _l2sq(
                        F.slice(
                            F.col(vec_col).cast("array<double>"),
                            c["sub"] * d + 1,
                            d,
                        ),
                        c["cent"],
                    ),
                    6,
                ),
            ).alias("dtab"),
        )
    )
    adc = (
        q_lists.join(corpus_scan, "list_id")
        .join(F.broadcast(qtab.drop("qv")), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    F.lit(0.0),
                    lambda acc, j: acc
                    + F.element_at(
                        F.col("dtab"),
                        j * k_codes + F.element_at(F.col("codes"), j + 1) + 1,
                    ),
                ),
                6,
            ).alias("adc"),
        )
        # a (query, neighbor) pair may meet in several probed lists; the
        # dedup + candidate window key on 20-byte scalar rows — no vector
        # payload rides either exchange (qv re-attaches from the broadcast
        # query side only for the bounded re-rank)
        .distinct()
    )
    wc = W.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    # materialized: two consumers (norm semi-join + re-rank join) would
    # otherwise each re-derive the probe join + ADC scan + window
    cand = _materialize(
        adc.withColumn("__r", F.row_number().over(wc))
        .filter(F.col("__r") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    # candidate-scoped corpus norms (r12, VERDICT-r11 #3): semi-join
    # scopes the norm projection to surviving candidates, the projection
    # below the re-rank join folds each neighbor's norm exactly once
    # (was: once per candidate PAIR). Same fold, same order —
    # cos_sim bit-identical; the live-table probe semantics (deleted
    # vectors drop out via the inner join) are unchanged, the semi-join
    # only narrows the side that the inner join would filter anyway.
    cvn = corpus_vecs.join(
        cand.select("neighbor_id").distinct(), "neighbor_id", "left_semi"
    ).select("neighbor_id", "cv", l2_norm(F.col("cv")).alias("__cn"))
    exact = cand.join(
        F.broadcast(qtab.select("query_id", "qv", "__qn")), "query_id"
    ).join(
        cvn,
        "neighbor_id",
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qv"), F.col("cv"))
            / (F.col("__qn") * F.col("__cn")),
            6,
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
