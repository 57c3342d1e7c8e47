#!/usr/bin/env python3
"""Scaling-exponent report (VERDICT r5 #4): fit each entry's time ratio
across a decade of scale and flag anything scaling worse than ~linear.

Usage:
  python3 tools/scaling_report.py BENCH_sf0.01.json BENCH_sf0.1.json BENCH_sf1.json

Decade used per entry:
  - star-schema/events families (the tables tools/make_sf1.py replicates
    cleanly): sf0.1 -> sf1  (the synthetic 10x)
  - content families (documents/embeddings — replication would fabricate
    cross-copy near-duplicates and a quadratic pair-join artifact):
    sf0.01 -> sf0.1  (the real decade)

exponent = log10(t_big / t_small). ~1.0 = linear, <1 sublinear (or
overhead-bound), >1 superlinear. Entries with t_small < 0.3 s are mostly
fixed-overhead and marked overhead_bound (their exponent is noise).
Writes BENCH_SCALING.json and prints a markdown table for SURVEY §5.
"""
import sys, json, math

DOC_ST = {"st_filter_funnel", "st_minhash_sig", "st_dedup_exact"}

def sf1_family(n):
    if n in DOC_ST:
        return False
    fams = ("wc_", "q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9",
            "window_", "rollup_", "cube_", "ev_", "st_")
    extra = {"anti_join_inactive_customers", "distinct_supplier_parts",
             "asof_join_latest_order", "range_join_price_tiers",
             "bloom_prune_join", "skew_salted_join_volume", "skew_distinct_users"}
    return n.startswith(fams) or n in extra

def load(path):
    doc = json.load(open(path))
    qmap, sentinel = {}, None
    for obj in doc:
        if obj.get("metric") == "queries":
            qmap = obj["queries"]
        if obj.get("metric") == "sentinel":
            sentinel = obj
    return qmap, sentinel

def main(p001, p01, p1):
    t001, s001 = load(p001)
    t01, s01 = load(p01)
    t1, s1 = load(p1)
    rows = []
    for name in sorted(t01):
        if sf1_family(name) and name in t1:
            small, big, decade = t01[name], t1[name], "sf0.1->sf1(synthetic)"
        elif name in t001:
            small, big, decade = t001[name], t01[name], "sf0.01->sf0.1"
        else:
            continue
        exp = math.log10(max(big, 1e-3) / max(small, 1e-3))
        rows.append({
            "name": name, "t_small": small, "t_big": big, "decade": decade,
            "exponent": round(exp, 2),
            "overhead_bound": small < 0.3,
            "superlinear": exp > 1.2 and big > 1.0 and small >= 0.3,
        })
    flagged = [r for r in rows if r["superlinear"]]
    out = {
        "sentinels": {"sf0.01": s001, "sf0.1": s01, "sf1": s1},
        "n_entries": len(rows),
        "n_superlinear": len(flagged),
        "entries": rows,
    }
    json.dump(out, open("BENCH_SCALING.json", "w"), indent=1)
    print(f"{len(rows)} entries; {len(flagged)} superlinear "
          f"(exp>1.2, t_big>1s, not overhead-bound)")
    print("\n| entry | decade | t_small | t_big | exp | note |")
    print("| --- | --- | --- | --- | --- | --- |")
    for r in sorted(rows, key=lambda r: -r["exponent"])[:15]:
        note = ("SUPERLINEAR" if r["superlinear"]
                else "overhead-bound" if r["overhead_bound"] else "")
        print(f"| {r['name']} | {r['decade']} | {r['t_small']} | "
              f"{r['t_big']} | {r['exponent']} | {note} |")
    return 0

if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
