"""Relational pipelines over the driver-provided parquet tables.

Conventions (driver contract):
  * every function takes ``sf_dir`` and returns a Dataset / pyarrow
    Table / pandas DataFrame;
  * computed/aggregate column names match the oracle SQL exactly;
  * float aggregates are rounded to 2 decimals on BOTH sides so that
    parallel-summation order (Ray) vs sequential order (DuckDB) cannot
    flip the hash — the residual error of a 60 k-row double sum is
    ~1e-6, far below the rounding quantum;
  * Ray is initialised by the caller (never here).

Scale notes are on each op: which ones shuffle, which broadcast,
which pre-aggregate (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from nidaba_ray.functions.compat import round_like_sql
from nidaba_ray.util import distinct_small, ensure_columns, join_partitions

# declared output schemas for queries whose final filter can drop every
# row — collection sites rebuild all-empty results against these
# (util.ensure_columns; round-2 verdict item 3)
_Q3_SCHEMA = pa.schema([
    ("l_orderkey", pa.int64()),
    ("revenue", pa.float64()),
    ("o_orderdate", pa.timestamp("us")),
])
_Q5_AGG_SCHEMA = pa.schema([("nationkey", pa.int64()), ("rev", pa.float64())])


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# Aggregation with partial pre-aggregation (TPC-H Q1 analog)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> pa.Table:
    """Grouped aggregate over lineitem with per-batch partial
    aggregation: each batch emits one row per (returnflag, linestatus)
    — the groupby then shuffles ~K rows per block instead of every
    input row (SURVEY.md §2.5 'pre-aggregate inside map_batches')."""
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate"]

    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(1.0), batch["l_tax"]))
        t = batch.select(["l_returnflag", "l_linestatus", "l_quantity",
                          "l_extendedprice", "l_discount"])
        t = t.append_column("disc_price", disc_price).append_column("charge", charge)
        df = t.to_pandas()
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            sum_disc=("l_discount", "sum"),
            count_order=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = _read(sf_dir, "lineitem", cols).map_batches(
        partial, batch_format="pyarrow", batch_size=65536
    ).repartition(1)
    # ^ partials are ≤ K rows per batch; coalescing them to one block
    # makes the final few-group aggregate a single small merge task
    # with no empty reduce partitions (the schema-less-RefBundle
    # warning source) — the standard 2-level tree reduce. Applied to
    # every few-group partial-fed rollup in this module.
    from ray.data.aggregate import Sum

    final = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_charge", alias_name="sum_charge"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("count_order", alias_name="count_order"),
    )
    df = final.to_pandas()  # K rows — tiny
    n = df["count_order"].astype("int64")
    out = pd.DataFrame(
        {
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": round_like_sql(df["sum_qty"], 2),
            "sum_base_price": round_like_sql(df["sum_base_price"], 2),
            "sum_disc_price": round_like_sql(df["sum_disc_price"], 2),
            "sum_charge": round_like_sql(df["sum_charge"], 2),
            "avg_qty": round_like_sql(df["sum_qty"] / n, 2),
            "avg_price": round_like_sql(df["sum_base_price"] / n, 2),
            "avg_disc": round_like_sql(df["sum_disc"] / n, 2),
            "count_order": n,
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(SUM(l_quantity) / COUNT(*), 2)                         AS avg_qty,
       ROUND(SUM(l_extendedprice) / COUNT(*), 2)                    AS avg_price,
       ROUND(SUM(l_discount) / COUNT(*), 2)                         AS avg_disc,
       COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Filter + projection (vectorized predicate inside map_batches)
# ---------------------------------------------------------------------------

def filter_high_value(sf_dir: str) -> rd.Dataset:
    """Narrow, shuffle-free: vectorized filter + computed column."""

    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater(batch["l_quantity"], 30.0),
                       pc.less(batch["l_discount"], 0.03))
        b = batch.filter(mask)
        revenue = pa.array(
            round_like_sql(
                pc.multiply(
                    b["l_extendedprice"],
                    pc.subtract(pa.scalar(1.0), b["l_discount"]),
                ).to_numpy(zero_copy_only=False),
                2,
            )
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_linenumber": b["l_linenumber"],
                "l_quantity": b["l_quantity"],
                "revenue": revenue,
            }
        )

    return _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(fn, batch_format="pyarrow")


FILTER_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       ROUND(l_extendedprice * (1 - l_discount), 2) AS revenue
FROM lineitem
WHERE l_quantity > 30 AND l_discount < 0.03
"""


# ---------------------------------------------------------------------------
# Broadcast join (small dimension side via ray.put — no shuffle)
# ---------------------------------------------------------------------------

def join_customer_orders(sf_dir: str) -> pa.Table:
    """orders ⋈ customer, customer broadcast: the dimension table goes
    into the object store ONCE (ray.put) and every map task reads the
    same reference — the 100 TB pattern for small-side joins
    (SURVEY.md §2.4), vs. shipping it per batch or shuffling orders."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def partial(batch: pa.Table) -> pa.Table:
        seg_map = ray.get(cust_ref)  # zero-copy shared read per worker
        df = batch.to_pandas()
        df["c_mktsegment"] = df["o_custkey"].map(seg_map)
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("o_orderkey", "size"), total_price=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .repartition(1)  # tiny partials — see q1_pricing_summary
        .groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("total_price", alias_name="total_price"))
        .to_pandas()
    )
    out["total_price"] = round_like_sql(out["total_price"], 2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


JOIN_CUSTOMER_SQL = """
SELECT c_mktsegment,
       COUNT(*)                    AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Large-large hash join (Dataset.join — explicit shuffle on the key)
# ---------------------------------------------------------------------------

def join_lineitem_orders(sf_dir: str) -> pa.Table:
    """lineitem ⋈ orders on orderkey — both sides large, so this is a
    genuine hash-partitioned shuffle join (Ray Data ``Dataset.join``),
    followed by a small grouped aggregate. Partitions count is the
    explicit knob that must scale with cluster size."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=join_partitions(16),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        df = pa.table({"o_orderpriority": batch["o_orderpriority"],
                       "revenue": rev}).to_pandas()
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n_items=("revenue", "size"), revenue=("revenue", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .repartition(1)  # tiny partials — see q1_pricing_summary
        .groupby("o_orderpriority")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = round_like_sql(out["revenue"], 2)
    out["n_items"] = out["n_items"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


JOIN_LARGE_SQL = """
SELECT o_orderpriority,
       COUNT(*)                                          AS n_items,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Sort / top-k
# ---------------------------------------------------------------------------

def topk_orders(sf_dir: str) -> pa.Table:
    """Top 10 orders by total price. ``sort`` is a full range shuffle;
    ties broken by o_orderkey so the k-boundary is deterministic."""
    out = (
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(10)
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


TOPK_SQL = """
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Distinct / set ops
# ---------------------------------------------------------------------------

def distinct_segments(sf_dir: str) -> pa.Table:
    vals = distinct_small(_read(sf_dir, "customer", ["c_mktsegment"]),
                          "c_mktsegment")
    return pa.table({"c_mktsegment": vals})


DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def union_names(sf_dir: str) -> pa.Table:
    """nation ∪ region names — ``Dataset.union`` keeps both lazy."""
    n = _read(sf_dir, "nation", ["n_name"]).map_batches(
        lambda t: pa.table({"name": t["n_name"]}), batch_format="pyarrow")
    r = _read(sf_dir, "region", ["r_name"]).map_batches(
        lambda t: pa.table({"name": t["r_name"]}), batch_format="pyarrow")
    df = n.union(r).to_pandas()
    return pa.Table.from_pandas(df, preserve_index=False)


UNION_SQL = """
SELECT n_name AS name FROM nation UNION ALL SELECT r_name AS name FROM region
"""


# ---------------------------------------------------------------------------
# Events: JSON extraction + time-bucketed aggregate (windowed analog)
# ---------------------------------------------------------------------------

def events_hourly(sf_dir: str) -> pa.Table:
    """Tumbling-window aggregate: per (event_type, hour) count, value
    sum, and sum of the JSON ``props.k`` field. Window = groupby on
    the truncated timestamp (Ray Data has no event-time windows —
    SURVEY.md §2.9); JSON decoded per batch, not per row on a driver
    loop."""

    def partial(batch: pa.Table) -> pa.Table:
        from nidaba_ray.functions.scalar import json_field_column

        hour = pc.floor_temporal(batch["ts"], unit="hour")
        # one shared JSON-field kernel (functions/scalar.py) — no
        # pyarrow JSON kernel exists in 16.x, so the per-row decode
        # lives in exactly one place
        k = pc.cast(json_field_column(batch["props"], "k"), pa.int64())
        df = pa.table({"event_type": batch["event_type"], "hour": hour,
                       "value": batch["value"],
                       "k": k}).to_pandas()
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"), sum_k=("k", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "events", ["event_type", "ts", "value", "props"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value", alias_name="sum_value"),
                   Sum("sum_k", alias_name="sum_k"))
        .to_pandas()
    )
    out["sum_value"] = round_like_sql(out["sum_value"], 2)
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_k"] = out["sum_k"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       COUNT(*)                    AS n_events,
       ROUND(SUM(value), 2)        AS sum_value,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


def latest_event_per_user(sf_dir: str) -> pa.Table:
    """Keep-latest dedup: one row per user_id with the max (ts,
    event_id) — the exact-dedup primitive (keep latest warc_ts per
    url in the pages world, §2.7).

    Shape: per-batch partial keep-latest (shrinks the shuffle to at
    most one row per user per block) → grouped Max over a fixed-width
    sortable string key encoding (ts, event_id) lexicographically →
    hash join back. Avoids ``map_groups`` over ~singleton groups,
    which BASELINE.md item 6 measured ~20× slower than aggregate+join
    at scale (per-group pandas overhead)."""
    from ray.data.aggregate import Max

    def partial_latest(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # sign-bit XOR maps int64 to uint64 ORDER-PRESERVINGLY, so the
        # fixed 20-digit zero-padded key covers the ENTIRE int64 range
        # (negatives included) with lexicographic == numeric order —
        # no width/sign assumptions on ts or event_id
        sign = np.uint64(1 << 63)
        ts_u = df["ts"].astype("int64").to_numpy().view(np.uint64) ^ sign
        ev_u = df["event_id"].astype("int64").to_numpy().view(np.uint64) ^ sign
        df["_k"] = [f"{a:020d}:{b:020d}" for a, b in zip(ts_u, ev_u)]
        df = df.sort_values("_k").groupby("user_id", as_index=False).tail(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    reduced = _read(
        sf_dir, "events", ["user_id", "event_id", "ts", "event_type"]
    ).map_batches(
        partial_latest, batch_format="pyarrow", batch_size=65536
    ).materialize()  # consumed by BOTH the aggregate and the join —
    # without this, Ray Data (no CSE) would re-run the events scan +
    # partial reduce twice
    maxes = reduced.groupby("user_id").aggregate(Max("_k", alias_name="_kmax"))
    joined = reduced.join(maxes, "inner", join_partitions(8), on=("user_id",))
    out = joined.map_batches(
        lambda t: t.filter(pc.equal(t["_k"], t["_kmax"])).select(
            ["user_id", "event_id", "ts", "event_type"]
        ),
        batch_format="pyarrow",
    ).to_pandas()
    # exact-duplicate (ts, event_id) rows arriving in different batches
    # would both carry the max key; the oracle's row_number()=1 keeps
    # exactly one row per user — mirror that deterministically
    out = (
        out.sort_values(list(out.columns))
        .drop_duplicates(subset=["user_id"], keep="first")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


LATEST_EVENT_SQL = """
SELECT user_id, event_id, ts, event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Semi / anti joins (broadcast key set — no shuffle; SURVEY.md §2.4)
# ---------------------------------------------------------------------------

# Above this many distinct keys, a broadcast sorted-int64 array stops
# being a reasonable per-task payload (~8 B/key: 4M keys ≈ 32 MB in
# every task's heap) and the semi/anti join switches to a Bloom
# prefilter + exact verification join — constant broadcast memory,
# with only the bloom-positive rows (true matches + ~1% FP) paying
# the shuffle. Never reached at sandbox scale; equality of the two
# paths is pinned in tests by monkeypatching this to 0.
_EXACT_BROADCAST_MAX = 4_000_000


def _distinct_keys_ds(ds: rd.Dataset, col: str) -> rd.Dataset:
    """Distinct keys of the right side AS A DATASET (one int64 column)
    — the driver never holds the key set in the Bloom path."""
    from ray.data.aggregate import Count

    return ds.groupby(col).aggregate(Count(alias_name="_n")).map_batches(
        lambda t: t.select([col]), batch_format="pyarrow"
    )


def _semi_anti_join(
    left: rd.Dataset, key_col: str, keys_raw: rd.Dataset, keys_col: str,
    negate: bool,
) -> rd.Dataset:
    """Broadcast semi/anti join (SURVEY.md §2.4).

    Small key set (≤ _EXACT_BROADCAST_MAX): ship the sorted int64 key
    array once via ray.put and filter each batch with ``pc.is_in`` —
    the fully vectorized q3 pattern (round-3 verdict item 2; the old
    per-row ``k in keys`` Python loop is gone).

    Large key set: broadcast a Bloom filter (constant memory), then
    verify exactly — semi keeps bloom-positive rows confirmed by an
    inner join against the distinct-keys dataset; anti keeps
    bloom-NEGATIVE rows outright (a Bloom has no false negatives) plus
    the bloom-positive rows a left_outer join fails to match. Both
    paths produce identical rows (pinned in pytest).

    The cutover decision uses the RAW right-side row count (a free
    parquet-metadata read for plain scans; an upper bound on the
    distinct-key count) so the common small case pays no extra
    distinct pass."""
    if keys_raw.count() <= _EXACT_BROADCAST_MAX:
        ref = ray.put(distinct_small(keys_raw, keys_col))

        def fn(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[key_col], value_set=ray.get(ref))
            if negate:
                mask = pc.invert(mask)
            return batch.filter(mask)

        return left.map_batches(fn, batch_format="pyarrow")

    from nidaba_ray.functions.bloom import BloomFilter

    keys_ds = _distinct_keys_ds(keys_raw, keys_col).materialize()
    n_keys = keys_ds.count()
    bf = BloomFilter(n_keys)
    for b in keys_ds.iter_batches(batch_format="pyarrow"):
        bf.add_many(np.asarray(b[keys_col]))  # streaming build
    bf_ref = ray.put(bf)

    def bloom_mask(batch: pa.Table, keep_positive: bool) -> pa.Table:
        hit = ray.get(bf_ref).contains_many(np.asarray(batch[key_col]))
        return batch.filter(pa.array(hit if keep_positive else ~hit))

    out_cols = left.schema().names
    positives = left.map_batches(
        lambda t: bloom_mask(t, True), batch_format="pyarrow"
    ).materialize()
    n_pos = positives.count()
    if not negate:
        if n_pos == 0:
            return positives
        verified = positives.repartition(
            min(join_partitions(8), n_pos)
        ).join(
            keys_ds.materialize(), "inner", join_partitions(8),
            on=(key_col,), right_on=(keys_col,),
        )
        return verified.map_batches(
            lambda t: t.select(out_cols), batch_format="pyarrow"
        )
    definite = left.map_batches(
        lambda t: bloom_mask(t, False), batch_format="pyarrow"
    )
    if n_pos == 0:
        return definite
    marked = keys_ds.map_batches(
        lambda t: t.append_column(
            "_hit", pa.array(np.ones(t.num_rows, dtype=np.int8))),
        batch_format="pyarrow",
    ).materialize()
    rescued = positives.repartition(min(join_partitions(8), n_pos)).join(
        marked, "left_outer", join_partitions(8),
        on=(key_col,), right_on=(keys_col,),
    ).map_batches(
        lambda t: t.filter(pc.is_null(t["_hit"])).select(out_cols),
        batch_format="pyarrow",
    )
    return definite.union(rescued)


def customers_with_orders(sf_dir: str) -> rd.Dataset:
    """Semi join: customers having ≥1 order."""
    return _semi_anti_join(
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]),
        "c_custkey", _read(sf_dir, "orders", ["o_custkey"]), "o_custkey",
        negate=False,
    )


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def customers_without_orders(sf_dir: str) -> rd.Dataset:
    """Anti join: customers with no URGENT-priority order (the
    predicate keeps the result non-empty on the synthetic data —
    every customer has *some* order)."""
    urgent = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    ).materialize()  # narrow int64 column, consumed by count + unique
    return _semi_anti_join(
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]),
        "c_custkey", urgent, "o_custkey", negate=True,
    )


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


SAMPLE_HEX_LT = "05"  # keep md5-prefix < 0x05 → 5/256 ≈ 1.95%


def sample_lineitem(sf_dir: str) -> rd.Dataset:
    """Deterministic hash sample (SURVEY.md §2.6): keep rows whose
    md5("orderkey:linenumber") hex prefix sorts below SAMPLE_HEX_LT.

    Unlike ``random_sample(seed=…)`` (row SET depends on block
    layout), the sampled set here is a pure function of the key — the
    same rows on 4 CPUs, 32 CPUs, or a 256-node cluster, and across
    reruns over re-partitioned input. That's the sample you want for a
    100 TB corpus (reproducible dev slices, resumable downstream), and
    it makes the op oracle-checkable in SQL (md5 on both sides).
    Rate tuning is per-256ths via the hex prefix; md5 keys are
    uniform, so the realized fraction concentrates tightly."""

    def fn(batch: pa.Table) -> pa.Table:
        import hashlib

        keep = pa.array([
            hashlib.md5(f"{ok}:{ln}".encode()).hexdigest()[:2] < SAMPLE_HEX_LT
            for ok, ln in zip(batch["l_orderkey"].to_pylist(),
                              batch["l_linenumber"].to_pylist())
        ])
        return batch.filter(keep)

    return _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"]
    ).map_batches(fn, batch_format="pyarrow")


SAMPLE_SQL = f"""
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                 CAST(l_linenumber AS VARCHAR)), 1, 2) < '{SAMPLE_HEX_LT}'
"""


def parts_by_brand(sf_dir: str) -> pa.Table:
    """Grouped aggregate over part (size filter + avg price)."""

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater_equal(batch["p_size"], 10))
        df = pa.table({"p_brand": b["p_brand"],
                       "p_retailprice": b["p_retailprice"]}).to_pandas()
        g = df.groupby("p_brand", as_index=False).agg(
            n_parts=("p_retailprice", "size"), sum_price=("p_retailprice", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(1)  # tiny partials — see q1_pricing_summary
        .groupby("p_brand")
        .aggregate(Sum("n_parts", alias_name="n_parts"),
                   Sum("sum_price", alias_name="sum_price"))
        .to_pandas()
    )
    out["avg_price"] = round_like_sql(out["sum_price"] / out["n_parts"], 2)
    out = out.drop(columns=["sum_price"]).astype({"n_parts": "int64"})
    return pa.Table.from_pandas(out, preserve_index=False)


PARTS_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       ROUND(SUM(p_retailprice) / COUNT(*), 2) AS avg_price
FROM part WHERE p_size >= 10
GROUP BY p_brand
"""


def supplier_nation_balance(sf_dir: str) -> pa.Table:
    """supplier ⋈ nation ⋈ region (two broadcast hops — the snowflake
    dimension chain): per region, supplier count + total balance."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    ref = ray.put((n2r, r2name))

    def fn(batch: pa.Table) -> pa.Table:
        n2r_, r2name_ = ray.get(ref)
        df = batch.to_pandas()
        df["r_name"] = df["s_nationkey"].map(n2r_).map(r2name_)
        g = df.groupby("r_name", as_index=False).agg(
            n_suppliers=("s_suppkey", "size"), total_acctbal=("s_acctbal", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
        .map_batches(fn, batch_format="pyarrow")
        .repartition(1)  # tiny partials — see q1_pricing_summary
        .groupby("r_name")
        .aggregate(Sum("n_suppliers", alias_name="n_suppliers"),
                   Sum("total_acctbal", alias_name="total_acctbal"))
        .to_pandas()
    )
    out["total_acctbal"] = round_like_sql(out["total_acctbal"], 2)
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


SUPPLIER_NATION_SQL = """
SELECT r_name, COUNT(*) AS n_suppliers,
       ROUND(SUM(s_acctbal), 2) AS total_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 analog — the 3-way join composed the scale-correct way
# ---------------------------------------------------------------------------

Q3_CUTOFF = pd.Timestamp("1997-01-01")
Q3_SEGMENT = "BUILDING"
Q3_K = 10


def q3_shipping_priority(sf_dir: str) -> pa.Table:
    """customer ⋈ orders ⋈ lineitem → top-K orders by revenue.

    Composition (each leg the cheapest shape for its side):
      1. customer is a broadcast semi-filter (BUILDING custkeys via
         ray.put) applied to orders — no customer shuffle at all;
      2. the surviving o_orderkey set is itself broadcast back into
         the lineitem scan, so the per-order revenue pre-aggregate
         only groups QUALIFYING orders — at TPC-H selectivities that
         cuts the (l_orderkey, partial_sum) shuffle and the grouped
         aggregate to ~1/5 (the round-2 verdict's q3 fix). At a scale
         where the surviving key set outgrows the object store,
         substitute a Bloom filter of the keys (functions/bloom.py) —
         same broadcast shape, exactness restored by the join in 3;
      3. lineitem pre-aggregates revenue per order INSIDE map_batches
         (the one groupby shuffle moves (l_orderkey, partial_sum) —
         never line items), then hash-joins the surviving
         (o_orderkey, o_orderdate) rows (partitions clamped);
      4. top-K is per-batch partial top-K merged on the driver
         (≤ K rows per batch) — the corpus is never sorted."""
    from ray.data.aggregate import Sum

    cutoff = pa.scalar(Q3_CUTOFF, pa.timestamp("us"))

    keys_ref = ray.put(distinct_small(
        _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .map_batches(
            lambda t: t.filter(
                pc.equal(t["c_mktsegment"], Q3_SEGMENT)).select(["c_custkey"]),
            batch_format="pyarrow",
        ),
        "c_custkey",
    ))

    def orders_filter(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.less(batch["o_orderdate"], cutoff))
        b = b.filter(pc.is_in(b["o_custkey"], ray.get(keys_ref)))
        return b.select(["o_orderkey", "o_orderdate"])

    ords = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_filter, batch_format="pyarrow").materialize()
    # ^ consumed twice (orderkey set below + the join) — no CSE in Ray
    # Data, and the filtered orders table is 2 narrow columns

    okeys_ref = ray.put(distinct_small(ords, "o_orderkey"))

    def rev_partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch["l_shipdate"], cutoff))
        b = b.filter(pc.is_in(b["l_orderkey"], ray.get(okeys_ref)))
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"l_orderkey": b["l_orderkey"], "rev": rev})
        # pyarrow-native partial combine (~20% faster than a pandas
        # round trip; same shuffle reduction)
        g = t.group_by("l_orderkey").aggregate([("rev", "sum")])
        return g.rename_columns(["l_orderkey", "rev"])

    rev = (
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(rev_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="rev"))
    )

    joined = rev.join(
        ords, "inner", join_partitions(8),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def topk_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # schema-less empty batches
            return _Q3_SCHEMA.empty_table()
        df = batch.to_pandas()
        df["revenue"] = round_like_sql(df["rev"], 2)
        df = df.sort_values(
            ["revenue", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
        ).head(Q3_K)
        return pa.Table.from_pandas(
            df[["l_orderkey", "revenue", "o_orderdate"]], preserve_index=False
        )

    parts = joined.map_batches(
        topk_partial, batch_format="pyarrow"
    ).to_pandas()  # ≤ K rows per batch
    parts = ensure_columns(parts, _Q3_SCHEMA)
    out = parts.sort_values(
        ["revenue", "o_orderdate", "l_orderkey"], ascending=[False, True, True]
    ).head(Q3_K).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


Q3_SQL = f"""
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate  > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT {Q3_K}
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 analog — star join via chained dimension broadcasts
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_FROM = pd.Timestamp("1996-01-01")
Q5_TO = pd.Timestamp("1997-01-01")


def q5_local_supplier_volume(sf_dir: str, cust_broadcast: bool = True) -> pa.Table:
    """Six-table star join, composed as ONE fact-fact hash join plus
    chained broadcast lookups — the 100 TB plan for star schemas:

      * region→nation→supplier/customer are DIMENSIONS: the ASIA
        nation-key set, the supplier→nation and customer→nation maps
        and the nation names ship once via ray.put and are read inside
        every map task (zero dimension shuffles);
      * lineitem ⋈ date-filtered orders is the only shuffle (hash join
        on orderkey, partitions clamped to the cluster);
      * the local-supplier predicate (c_nationkey = s_nationkey) and
        the per-nation revenue rollup run vectorized per batch, so the
        final groupby moves ≤ n_nations rows per block.

    Scale caveat, with the fallback IMPLEMENTED: supplier/nation/
    region are genuinely tiny, but customer grows with the corpus —
    ``cust_broadcast=False`` switches orders ⋈ customer to a second
    clamped hash join (the Q3 shape) so nothing corpus-sized is ever
    driver-loaded; everything downstream is shared, and pytest pins
    both modes equal. The broadcast default stays because at bench
    scale the map ships once per node vs an extra all-to-all."""
    from ray.data.aggregate import Sum

    # --- dimension broadcasts (all tiny)
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rkeys = set(region.loc[region["r_name"] == Q5_REGION, "r_regionkey"])
    nation = _read(
        sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    nation = nation[nation["n_regionkey"].isin(rkeys)]
    nation_names = dict(zip(nation["n_nationkey"], nation["n_name"]))
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp = supp[supp["s_nationkey"].isin(nation_names)].sort_values("s_suppkey")
    # broadcast sorted numpy key/value ARRAYS, not dicts: ray.get of a
    # numpy array is zero-copy from the object store, while a dict
    # would be re-deserialized per batch; lookup = searchsorted
    supp_k = ray.put(supp["s_suppkey"].to_numpy(np.int64))
    supp_v = ray.put(supp["s_nationkey"].to_numpy(np.int64))
    if cust_broadcast:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
        cust = cust.sort_values("c_custkey")
        cust_k = ray.put(cust["c_custkey"].to_numpy(np.int64))
        cust_v = ray.put(cust["c_nationkey"].to_numpy(np.int64))

    def _lookup(keys_arr, vals_arr, q: np.ndarray):
        """Sorted-array map: returns (values, found_mask)."""
        if len(keys_arr) == 0:
            return np.zeros(len(q), dtype=np.int64), np.zeros(len(q), bool)
        pos = np.clip(np.searchsorted(keys_arr, q), 0, len(keys_arr) - 1)
        found = keys_arr[pos] == q
        return vals_arr[pos], found

    lo = pa.scalar(Q5_FROM, pa.timestamp("us"))
    hi = pa.scalar(Q5_TO, pa.timestamp("us"))

    ords = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                    pc.less(t["o_orderdate"], hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    if not cust_broadcast:
        # at-scale customer path: a second clamped hash join resolves
        # o_custkey → c_nationkey on the cluster; the fact rows carry
        # one extra int64 column into the orderkey join, nothing more
        ords = _read(
            sf_dir, "customer", ["c_custkey", "c_nationkey"]
        ).join(
            ords, "inner", join_partitions(8),
            on=("c_custkey",), right_on=("o_custkey",),
        ).map_batches(
            lambda t: t.select(["o_orderkey", "c_nationkey"]),
            batch_format="pyarrow",
        )
    line = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    joined = line.join(
        ords, "inner", join_partitions(8),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        sk, sv = ray.get(supp_k), ray.get(supp_v)   # zero-copy arrays
        if batch.num_rows == 0 or len(sk) == 0:
            return pa.table({"nationkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        supp_q = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        s_nat, s_ok = _lookup(sk, sv, supp_q)       # miss → non-ASIA supplier
        if cust_broadcast:
            ck, cv = ray.get(cust_k), ray.get(cust_v)
            cust_q = batch["o_custkey"].to_numpy(zero_copy_only=False)
            c_nat, c_ok = _lookup(ck, cv, cust_q)
        else:  # nationkey arrived via the customer hash join
            c_nat = batch["c_nationkey"].to_numpy(zero_copy_only=False)
            c_ok = np.ones(len(c_nat), dtype=bool)
        keep = s_ok & c_ok & (s_nat == c_nat)       # local-supplier predicate
        rev = (batch["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False)))
        df = pd.DataFrame({"nationkey": s_nat[keep], "rev": rev[keep]})
        g = df.groupby("nationkey", as_index=False).agg(rev=("rev", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .repartition(1)  # tiny partials — see q1_pricing_summary
        .groupby("nationkey")
        .aggregate(Sum("rev", alias_name="rev"))
        .to_pandas()  # ≤ n_nations rows
    )
    agg = ensure_columns(agg, _Q5_AGG_SCHEMA)
    agg["n_name"] = agg["nationkey"].map(nation_names).astype("string")
    agg["revenue"] = round_like_sql(agg["rev"], 2)
    out = agg[["n_name", "revenue"]].sort_values(
        ["revenue", "n_name"], ascending=[False, True]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


Q5_SQL = f"""
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""
