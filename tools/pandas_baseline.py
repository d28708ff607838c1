#!/usr/bin/env python3
"""Reference-equivalent single-node baseline: the reference pipeline is
pandas (src/transformers/*.py use DataFrame.apply / drop_duplicates /
merge / json parsing per row). This measures those idioms on the same
sf tables the bench runs on, one timing per registered query where a
faithful pandas equivalent exists. Dev/measurement tool only."""
import json, sys, time

import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

T = {}
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    T[t] = pd.read_parquet(f"{SF}/{t}.parquet")

def timed(name):
    def deco(fn):
        t0 = time.time()
        fn()
        T.setdefault("_times", {})[name] = round(time.time() - t0, 4)
        return fn
    return deco

@timed("q01_rowcounts")
def q01():
    pd.DataFrame([(k, len(v)) for k, v in T.items() if not k.startswith("_")],
                 columns=["table_name", "n_rows"]).sort_values("n_rows", ascending=False)

@timed("q02_dedup_keep_last")
def q02():
    # shopee_orders_loader.py:283-340 idiom
    T["events"].sort_values("event_id").drop_duplicates(
        subset=["user_id", "event_type"], keep="last").sort_values(["user_id", "event_type"])

@timed("q03_normalize_props")
def q03():
    # per-row json parsing as in shopee_orders_transformer.py
    ev = T["events"]
    parsed = ev["props"].map(lambda s: json.loads(s).get("k"))
    pd.DataFrame({"event_id": ev.event_id, "event_type": ev.event_type,
                  "prop_k": parsed}).dropna(subset=["prop_k"]).sort_values("event_id")

@timed("q04_explode_tokens")
def q04():
    w = T["part"].p_name.str.split(" ").explode()
    w.value_counts()

@timed("q05_flatten_prefix")
def q05():
    # misa_crm_transformer.py flatten idiom: merge + prefix + counts
    o = T["orders"][["o_orderkey", "o_orderstatus"]].add_prefix("order_")
    l = T["lineitem"][["l_orderkey", "l_linenumber", "l_quantity"]].add_prefix("item_")
    m = o.merge(l, left_on="order_o_orderkey", right_on="item_l_orderkey", how="left")
    cnt = m.groupby("order_o_orderkey")["item_l_orderkey"].transform("count")
    m["total_items_in_order"] = cnt
    m["has_multiple_items"] = cnt > 1
    m.sort_values(["order_o_orderkey", "item_l_linenumber"])

def _sf(v):
    try: return float(v)
    except (ValueError, TypeError): return None

@timed("q06_safe_casts")
def q06():
    # _safe_int/_safe_float apply-per-value idiom (transformer.py:45-86)
    p = T["part"]
    def safe_int(v):
        try: return int(v)
        except (ValueError, TypeError): return None
    p.p_brand.map(safe_int)
    p.p_brand.str.extract(r"([0-9]+)")[0].map(safe_int)
    p.p_type.map(_sf)
    p.p_name.str.slice(0, 12)

@timed("q07_unix_ts")
def q07():
    o = T["orders"]
    sec = np.where(o.o_orderkey % 10 == 0, 0, o.o_orderkey * 7919)
    s = pd.Series(sec).map(lambda x: None if not x else pd.to_datetime(x, unit="s", utc=True))
    s.map(lambda t: None if t is None or t is pd.NaT else t.strftime("%Y-%m-%d %H:%M:%S"))

@timed("q08_etl_metadata")
def q08():
    df = T["nation"].copy()
    df["etl_batch_id"] = "batch-0001"
    df["etl_created_at"] = pd.Timestamp("2024-01-01")
    df["etl_updated_at"] = pd.Timestamp("2024-01-01")
    df["etl_source"] = "graft_engine"

@timed("q09_incremental_agg")
def q09():
    ev = T["events"]
    w = ev[ev.ts >= pd.Timestamp("2024-01-20")]
    w.groupby("event_type").agg(n_events=("event_id", "size"), total_value=("value", "sum"))

@timed("q10_star_join")
def q10():
    m = (T["lineitem"].merge(T["orders"], left_on="l_orderkey", right_on="o_orderkey")
         .merge(T["customer"], left_on="o_custkey", right_on="c_custkey")
         .merge(T["nation"], left_on="c_nationkey", right_on="n_nationkey")
         .merge(T["region"], left_on="n_regionkey", right_on="r_regionkey"))
    m["rev"] = m.l_extendedprice * (1.0 - m.l_discount)
    m.groupby(["r_name", "l_returnflag"]).agg(
        revenue=("rev", "sum"), n_orders=("o_orderkey", "nunique"))

@timed("q11_upsert")
def q11():
    o = T["orders"][["o_orderkey", "o_orderstatus", "o_totalprice"]]
    base = o[o.o_orderkey % 3 != 0].assign(src=0)
    upd = o[o.o_orderkey % 2 == 0].assign(o_orderstatus="U",
                                          o_totalprice=o.o_totalprice * 2, src=1)
    pd.concat([base, upd]).sort_values("src").drop_duplicates("o_orderkey", keep="last")

@timed("q12_delete_insert")
def q12():
    c = T["customer"][["c_custkey", "c_mktsegment", "c_acctbal"]]
    delta = c[c.c_custkey % 10 == 0].assign(c_mktsegment="REFRESH", c_acctbal=0.0)
    pd.concat([c[~c.c_custkey.isin(delta.c_custkey)], delta]).sort_values("c_custkey")

@timed("q13_cascade_order")
def q13():
    pd.DataFrame([(1, "lineitem", len(T["lineitem"])), (2, "orders", len(T["orders"]))],
                 columns=["del_order", "table_name", "n_rows"])

@timed("q14_schema_project")
def q14():
    target = ["o_orderkey", "o_orderdate", "o_totalprice", "column_only_in_target"]
    o = T["orders"]
    o[[c for c in target if c in o.columns]].sort_values("o_orderkey")

@timed("q15_batch_stats")
def q15():
    ev = T["events"]
    ev.groupby(ev.ts.dt.date).agg(n_events=("event_id", "size"),
                                  n_users=("user_id", "nunique"),
                                  total_value=("value", "sum"))

@timed("q16_audit_log")
def q16():
    T["events"].groupby("event_type").agg(
        n_rows=("event_id", "size"), window_start=("ts", "min"),
        window_end=("ts", "max"), total_value=("value", "sum"))

@timed("q17_exact_dedup")
def q17():
    import hashlib, re
    d = T["documents"][["doc_id", "text"]]
    re2 = d[d.doc_id % 5 == 0].assign(doc_id=lambda x: x.doc_id + 10000)
    alld = pd.concat([d, re2])
    h = alld.text.map(lambda t: hashlib.md5(re.sub(r"\s+", " ", t.lower().strip()).encode()).hexdigest())
    alld.assign(h=h).groupby("h").agg(keep=("doc_id", "min"), n=("doc_id", "size"))

@timed("q23_text_stats")
def q23():
    import re
    stop = {"the","a","an","and","or","of","to","in","is","it","that","was","for","on","with","as","at","by","be","this"}
    d = T["documents"]
    toks = d.text.map(lambda t: re.sub(r"\s+", " ", t.lower().strip()).split(" "))
    nt = toks.map(len)
    toks.map(lambda ts: sum(1 for t in ts if t in stop)) / nt.clip(lower=1)
    toks.map(lambda ts: len(set(ts))) / nt.clip(lower=1)
    d.text.map(lambda t: sum(1 for ch in t if 33 <= ord(ch) <= 47 or 58 <= ord(ch) <= 64
                             or 91 <= ord(ch) <= 96 or 123 <= ord(ch) <= 126)) / d.text.str.len().clip(lower=1)

@timed("q24_fingerprint")
def q24():
    import hashlib, re
    def fp(t):
        toks = re.sub(r"\s+", " ", t.lower().strip()).split(" ")
        hs = [int(hashlib.md5(x.encode()).hexdigest()[:8], 16) for x in toks]
        acc = hs[0]
        for h in hs[1:]:
            acc = (acc * 31 + h) % 1000000007
        return acc
    T["documents"].text.map(fp)

@timed("q21_cosine_topk")
def q21():
    e = T["embeddings"]
    V = np.array(e.embedding.tolist(), dtype=np.float64)
    q = V[(e.vec_id == 7).values][0]
    sims = V @ q / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    e.assign(cos=sims)[e.vec_id != 7].nlargest(10, "cos")

@timed("q25_multimodal_meta")
def q25():
    d = T["documents"]
    b = d.text.map(lambda t: t.encode("utf-8"))
    n = b.map(len)
    b.map(lambda x: x[:4].hex())
    (n + 255) // 256

@timed("q27_sessionize")
def q27():
    ev = T["events"].sort_values(["user_id", "ts", "event_id"]).copy()
    us = ev.ts.astype("int64") // 1000
    gap = us - us.groupby(ev.user_id.values).shift(1)
    ev["session_id"] = (~(gap <= 1_800_000_000)).groupby(ev.user_id.values).cumsum()
    ev.assign(us=us).groupby(["user_id", "session_id"]).agg(
        n_events=("event_id", "size"), session_start=("ts", "min"),
        session_end=("ts", "max"), total_value=("value", "sum"),
        min_us=("us", "min"), max_us=("us", "max"))

@timed("q28_asof_join")
def q28():
    ev = T["events"]
    p = ev[ev.event_type == "purchase"][["event_id", "user_id", "ts"]].sort_values("ts")
    v = (ev[ev.event_type == "view"][["event_id", "user_id", "ts"]]
         .sort_values(["ts", "event_id"])
         .rename(columns={"event_id": "view_event_id"}))
    m = pd.merge_asof(p, v, on="ts", by="user_id", direction="backward")
    (m.ts.astype("int64") // 1000)  # gap material

@timed("q29_topn_per_group")
def q29():
    rev = T["orders"].groupby("o_custkey").o_totalprice.sum().reset_index(name="rev")
    j = (rev.merge(T["customer"][["c_custkey", "c_nationkey"]],
                   left_on="o_custkey", right_on="c_custkey")
            .merge(T["nation"][["n_nationkey", "n_name"]],
                   left_on="c_nationkey", right_on="n_nationkey"))
    j["rnk"] = j.sort_values(["rev", "c_custkey"], ascending=[False, True]) \
                .groupby("n_name").cumcount() + 1
    j[j.rnk <= 3].sort_values(["n_name", "rnk"])

@timed("q30_rollup")
def q30():
    o = T["orders"]
    leaf = o.groupby(["o_orderpriority", "o_orderstatus"]).agg(
        n=("o_orderkey", "size"), rev=("o_totalprice", "sum")).reset_index()
    sub = o.groupby("o_orderpriority").agg(
        n=("o_orderkey", "size"), rev=("o_totalprice", "sum")).reset_index()
    pd.concat([leaf, sub, pd.DataFrame([{"n": len(o), "rev": o.o_totalprice.sum()}])])

@timed("q31_pivot")
def q31():
    ev = T["events"]
    ev.pivot_table(index=ev.ts.dt.date, columns="event_type",
                   values="value", aggfunc="sum")

@timed("q32_percentile")
def q32():
    T["events"].groupby("event_type").value.quantile([0.5, 0.95, 0.99])

@timed("q33_quarantine")
def q33():
    import json as _json
    ev = T["events"]
    props = ev.props.where(ev.event_id % 7 != 0, ev.props.str.replace("{", "<"))
    def parse(p):
        try:
            return _json.loads(p).get("k")
        except Exception:
            return None
    k = props.map(parse)
    ev.assign(ok=k.notna(), k=k).groupby("event_type").agg(
        n_valid=("ok", "sum"), n_quarantined=("ok", lambda s: (~s).sum()),
        sum_k=("k", "sum"))

@timed("q34_running_total")
def q34():
    o = T["orders"].sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    o.assign(running=o.groupby("o_custkey").o_totalprice.cumsum())

times = T["_times"]
print(json.dumps(times))
print("total", round(sum(times.values()), 3), "n_queries", len(times))
