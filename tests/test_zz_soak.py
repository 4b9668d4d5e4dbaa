"""TEMPORARY hypothesis soak (not committed)."""
from __future__ import annotations
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="session")
def spark_global(spark):
    return spark

_txlog_ops = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(0, 7)),
        st.tuples(st.just("merge"), st.integers(0, 39)),
        st.tuples(st.just("delete"), st.integers(0, 39)),
        st.tuples(st.just("dvdel"), st.integers(0, 39)),
        st.tuples(st.just("cdc"), st.integers(0, 39)),
        st.tuples(st.just("update"), st.integers(0, 39)),
        st.tuples(st.just("rename"), st.integers(0, 1)),
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=80, deadline=None)
@given(ops=_txlog_ops, use_identity=st.booleans())
def test_soak_txlog_verbs(
    spark_global, tmp_path_factory, ops, use_identity
):
    """MODEL-BASED check of the whole verb set: any sequence of
    append / merge (type-1 upsert) / range delete / DV delete / apply_cdc
    / range update / column rename must leave the table equal to the same
    sequence applied to a plain dict — the executable spec of the commit
    protocol's read-modify-write semantics (file-level pruning, deletion
    vectors, column mapping, OCC, stats bookkeeping are all invisible to
    it, which is exactly the point). The rename verb TOGGLES the value
    column's logical name mid-sequence, so every later verb must keep
    working through the mapping (and the rename-back collapses it).

    The IDENTITY toggle (r7 verdict task 4) registers a surrogate-key
    column before the sequence: the dict model is blind to it, but after
    ANY verb mix the allocated ids must be non-null, table-wide unique,
    on the (start, step) lattice, and bounded by the committed
    watermark — the invariants that hold iff every write path allocates
    atomically and none rewinds the mark."""
    from flink_real_time_data_warehouse_spark.storage import TxLog

    spark = spark_global
    log = TxLog(str(tmp_path_factory.mktemp("txmodel") / "t"))
    if use_identity:
        log.add_identity_column("sid", start=7, step=3)
    model: dict[int, int] = {}
    vcol = "v"  # current logical name of the value column
    # append is a MULTISET add, not an upsert: its keys live in their own
    # space (2000+) so the dict model stays valid — merge/delete/cdc share
    # the low key space and exercise the read-modify-write interplay.
    next_base = 2000
    for i, (op, arg) in enumerate(ops):
        if op == "append":
            lo = next_base
            next_base += 10
            rows = [(k, k * 100 + i) for k in range(lo, lo + 5 + arg % 3)]
            log.append(
                spark.createDataFrame(rows, f"k long, {vcol} long").coalesce(1),
                stats_cols=["k"],
            )
            model.update({k: v for k, v in rows})
        elif op == "merge":
            rows = [(arg + d, -(i * 100 + d)) for d in range(3)]
            log.merge(
                spark, spark.createDataFrame(rows, f"k long, {vcol} long"), "k"
            )
            model.update({k: v for k, v in rows})
        elif op == "delete":
            log.delete(spark, "k", arg, arg + 4)
            model = {k: v for k, v in model.items() if not arg <= k <= arg + 4}
        elif op == "dvdel":
            # deletion-vector delete: same logical spec as delete, zero
            # rewrites physically — the model can't tell, which is the point
            log.delete_to_dv(spark, "k", arg, arg + 4)
            model = {k: v for k, v in model.items() if not arg <= k <= arg + 4}
        elif op == "update":
            # guard on SCHEMA, not version: with the identity toggle, v0
            # is the registration property commit and carries no schema
            if log.state().schema_json is not None:
                log.update(spark, "k", arg, arg + 4, {vcol: f"{vcol} + 1000000"})
            model = {
                k: (v + 1000000 if arg <= k <= arg + 4 else v)
                for k, v in model.items()
            }
        elif op == "rename":
            if log.state().schema_json is not None:
                new = "val" if vcol == "v" else "v"
                log.rename_column(vcol, new)
                vcol = new
        else:  # cdc: one upsert, one delete, one insert
            ch = [
                (arg, -1, "u"),
                (arg + 1, None, "d"),
                (1000 + i, i, "i"),
            ]
            log.apply_cdc(
                spark,
                spark.createDataFrame(ch, f"k long, {vcol} long, op string"),
                "k",
            )
            model[arg] = -1
            model.pop(arg + 1, None)
            model[1000 + i] = i
    if log.state().schema_json is None:
        # every op was a no-op on a schema-less table (e.g. a lone
        # disjoint delete, or a rename before any data commit): no
        # schema exists and snapshot() rightly raises (with identity,
        # v0 is the registration property commit, still schema-less)
        assert model == {}
        return
    rows = log.snapshot(spark).collect()
    got = {r["k"]: r[vcol] for r in rows}
    assert got == model
    if use_identity and rows:
        sids = [r["sid"] for r in rows]
        assert all(s is not None for s in sids)
        assert len(set(sids)) == len(sids), "surrogate ids must stay unique"
        assert all((s - 7) % 3 == 0 and s >= 7 for s in sids)
        high = log.identity_columns()["sid"]["high"]
        assert high is not None and max(sids) <= high


