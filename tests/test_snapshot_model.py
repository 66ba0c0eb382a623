"""Model-based randomized interleaving test of the snapshot table: a
seeded random walk over every mutating operation the table supports —
append, deletion-vector DELETE, merge-on-read UPDATE, three-branch
merge-on-read MERGE, metadata-only rename, RESTORE, OPTIMIZE
compaction, DV materialization, VACUUM, CHECK constraints — validated
after EVERY step against an exact in-memory model. This is the
systematic interaction check the per-operation tests can't give:
deletes over renamed columns, compaction folding tombstones while
history shrinks under vacuum, updates landing post-rename files next to
pre-rename ones, etc. Values are chosen binary-exact (k * 1.5, +100.0)
so the comparison is ==, not approx."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from s3_glue_redshift_guide_spark.sources.snapshots import SnapshotTable


def _read_model(t: SnapshotTable, col: str) -> dict[int, float]:
    return {
        r["k"]: r[col] for r in t.read().select("k", col).collect()
    }


@pytest.mark.parametrize("seed", [7, 23, 42, 99])
def test_random_interleaving_matches_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = SnapshotTable(spark, str(tmp_path / f"model_{seed}"))
    model: dict[int, float] = {}
    col = "bal"  # current logical name of the value column
    next_key = 0
    renames = 0
    last_version = 0
    bloomed = False
    # half the seeds run the ENTIRE walk with a generated column in
    # force: every append/update/merge/restore write computes or
    # validates k3 = k*3 alongside whatever else the step does
    gencol = seed % 2 == 0
    if gencol:
        t.add_generated_column("k3", "k * 3")
    # a third of the seeds ALSO run the walk with a column DEFAULT in
    # force: every write path that omits `src` must fill it, through
    # every interleaving (updates/merges carry it, restores revert it
    # consistently with the rest of the row)
    defcol = seed % 3 == 0
    if defcol:
        t.add_column_default("src", "'w'")
    # a third of the seeds run the ENTIRE walk with a HIDDEN
    # PARTITIONING transform spec in force: every write path lands a
    # bucket(k, 4) layout, and every step cross-checks a partition-
    # pruned point read against the model — pruning through arbitrary
    # interleavings of DV deletes, MOR updates, renames, optimizes,
    # restores, branches and vacuums must never lose a row
    transform_spec = seed % 3 == 1
    if transform_spec:
        t.set_partition_spec(["bucket(k, 4)"])

    def append():
        nonlocal next_key
        n = rng.randrange(20, 60)
        rows = [(k, k * 1.5) for k in range(next_key, next_key + n)]
        next_key += n
        df = spark.createDataFrame(rows, f"k bigint, {col} double")
        t.commit_append(df.coalesce(1), stats_cols=["k"])
        model.update(dict(rows))

    def delete():
        r = rng.randrange(5)
        t.delete_where(F.col("k") % 5 == r)
        for k in [k for k in model if k % 5 == r]:
            del model[k]

    def update():
        r = rng.randrange(7)
        t.update_where(
            F.col("k") % 7 == r, {col: F.col(col) + F.lit(100.0)}
        )
        for k in model:
            if k % 7 == r:
                model[k] += 100.0

    def rename():
        nonlocal col, renames
        renames += 1
        new = f"bal_{renames}"
        t.rename_column(col, new)
        col = new

    def optimize():
        t.optimize_small_files(10 << 20, 10 << 20)

    def materialize():
        t.materialize_deletes()

    def vacuum():
        t.vacuum(retain_versions=3)

    def bloom():
        nonlocal bloomed
        try:
            t.add_bloom_index("k", fpp=0.01)
        except ValueError:
            pass  # already indexed on this walk
        bloomed = True

    def constraint():
        # a true contract (keys are non-negative by construction): every
        # later write pays the enforcement pass and must still succeed
        try:
            t.add_constraint("k_nonneg", "k >= 0")
        except ValueError:
            pass  # already registered on this walk

    def merge():
        # FOUR-branch MERGE: matched keys k%6==r update to src values
        # (+1000), except k%17==rdel which DELETE; fresh keys INSERT;
        # and half the merges also run WHEN NOT MATCHED BY SOURCE on a
        # thin slice (unmatched target keys k%23==rnm tombstone) — all
        # in one commit, interleaved with every other operation
        nonlocal next_key
        r, rdel = rng.randrange(6), rng.randrange(17)
        matched = {
            k: v + 1000.0 for k, v in model.items() if k % 6 == r
        }
        n_new = rng.randrange(5, 15)
        fresh = {k: k * 1.5 for k in range(next_key, next_key + n_new)}
        next_key += n_new
        src = spark.createDataFrame(
            list({**matched, **fresh}.items()),
            f"k bigint, {col} double",
        )
        nmbs = None
        rnm = rng.randrange(23)
        if rng.random() < 0.5:
            nmbs = F.col("k") % 23 == rnm
        t.merge_mor(
            src,
            on=["k"],
            when_matched_update={col: F.col(f"__src_{col}")},
            when_matched_delete=F.col("k") % 17 == rdel,
            when_not_matched_by_source_delete=nmbs,
        )
        if nmbs is not None:
            for k in [
                k
                for k in model
                if k % 23 == rnm and k % 6 != r  # unmatched only
            ]:
                del model[k]
        for k, v in matched.items():
            if k % 17 == rdel:
                del model[k]
            else:
                model[k] = v
        model.update(fresh)

    def cluster_append():
        # layout-only variant: the clustered write must change WHICH
        # file a row lands in, never the rows themselves
        nonlocal next_key
        n = rng.randrange(20, 60)
        rows = [(k, k * 1.5) for k in range(next_key, next_key + n)]
        next_key += n
        df = spark.createDataFrame(rows, f"k bigint, {col} double")
        t.commit_append(
            df.repartition(3), stats_cols=["k"], cluster_by=("k", "k")
        )
        model.update(dict(rows))

    def restore():
        # only versions inside the vacuum retention window (last 3)
        cur = t.current_version()
        lo = max(1, cur - 2)
        candidates = [v for v in history if lo <= v <= cur]
        if not candidates:
            return
        nonlocal col
        v = rng.choice(sorted(candidates))
        t.restore(v)
        snap_model, snap_col = history[v]
        model.clear()
        model.update(snap_model)
        col = snap_col

    def branch_cycle():
        # WAP inside the walk: fork, mutate the BRANCH (append and
        # maybe a delete) against a branch-local model copy, then
        # either fast-forward (main adopts the branch model — legal
        # because the walk is single-threaded, so main never moved) or
        # drop the branch (main's model must be untouched either way
        # until the ff lands; the per-step assertion checks it)
        nonlocal next_key
        name = f"wap{t.current_version()}_{rng.randrange(1 << 16)}"
        t.create_branch(name)
        b = t.branch(name)
        bmodel = dict(model)
        n = rng.randrange(10, 30)
        rows = [(k, k * 1.5) for k in range(next_key, next_key + n)]
        next_key += n
        b.commit_append(
            spark.createDataFrame(
                rows, f"k bigint, {col} double"
            ).coalesce(1),
            stats_cols=["k"],
        )
        bmodel.update(dict(rows))
        if rng.random() < 0.5:
            r = rng.randrange(5)
            b.delete_where(F.col("k") % 5 == r)
            for k in [k for k in bmodel if k % 5 == r]:
                del bmodel[k]
        assert _read_model(b, col) == bmodel, "branch/model diverged"
        assert _read_model(t, col) == model, "fork leaked into main"
        if rng.random() < 0.7:
            t.fast_forward(name)
            model.clear()
            model.update(bmodel)
        else:
            t.drop_branch(name)

    tags: dict[str, tuple[dict[int, float], str]] = {}

    def tag():
        # tag the head; every later step re-checks a random live tag
        # reads EXACTLY its tagged snapshot (vacuum must pin it)
        name = f"rel{t.current_version()}_{rng.randrange(1 << 16)}"
        try:
            t.create_tag(name)
        except ValueError:
            return
        tags[name] = (dict(model), col)

    history: dict[int, tuple[dict[int, float], str]] = {}

    append()  # always start with rows
    assert _read_model(t, col) == model
    history[t.current_version()] = (dict(model), col)
    ops = [append, delete, update, rename, optimize, materialize,
           vacuum, restore, constraint, merge, bloom, branch_cycle,
           tag, cluster_append]
    weights = [3, 2, 2, 1, 1, 1, 1, 1, 1, 2, 1, 2, 1, 1]
    for step in range(16):
        op = rng.choices(ops, weights=weights)[0]
        op()
        v = t.current_version()
        assert v >= last_version  # versions never regress
        last_version = v
        got = _read_model(t, col)
        assert got == model, (
            f"seed={seed} step={step} op={op.__name__}: table/model "
            f"diverged ({len(got)} vs {len(model)} rows)"
        )
        history[v] = (dict(model), col)
        if gencol:
            # the generated contract holds through EVERY interleaving
            assert (
                t.read().filter(
                    ~F.col("k3").eqNullSafe(F.col("k") * 3)
                ).count()
                == 0
            ), f"seed={seed} step={step}: generated column violated"
        if defcol:
            # the DEFAULT contract holds too: every row was written
            # after registration, so none may carry anything but 'w'
            assert (
                t.read().filter(F.col("src") != "w").count() == 0
            ), f"seed={seed} step={step}: default column violated"
        if bloomed and model:
            # bloom point lookups agree with the model after any mix of
            # rename/optimize/restore/vacuum (false negatives = lost
            # rows; unindexed or restored files must read conservative)
            k_in = rng.choice(sorted(model))
            rows = t.read_where_eq("k", k_in).select("k", col).collect()
            assert [(r["k"], r[col]) for r in rows] == [
                (k_in, model[k_in])
            ], f"seed={seed} step={step}: bloom lookup lost a row"
            assert (
                t.read_where_eq("k", next_key + 1_000_000).count() == 0
            )
        if transform_spec and model:
            # transform-pruned point read == model (superset contract:
            # pruning may keep extra files, the residual filter decides)
            k_in = rng.choice(sorted(model))
            got_p = {
                r["k"]: r[col]
                for r in t.read_partition({"k": k_in})
                .filter(F.col("k") == k_in)
                .select("k", col)
                .collect()
            }
            assert got_p == {k_in: model[k_in]}, (
                f"seed={seed} step={step}: transform-pruned read "
                "lost or corrupted the probe row"
            )
        if tags:
            # a random live tag still reads EXACTLY its tagged snapshot
            # — through renames, restores, optimizes, branch publishes
            # and vacuums (the tag pins its manifest and files)
            name = rng.choice(sorted(tags))
            tmodel, tcol = tags[name]
            got_tag = {
                r["k"]: r[tcol]
                for r in t.read(tag=name).select("k", tcol).collect()
            }
            assert got_tag == tmodel, (
                f"seed={seed} step={step}: tag {name} drifted"
            )
