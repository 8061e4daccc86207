"""VALUE-level invariant checks at the derived sf1/sf10 decades.

The round-8 lesson: wall-only decade rows can hide silently-wrong
values — the prefix device returned thousands of corrupted (negative)
group ranks at sf10 for two rounds while its sf10 wall/shuffle rows
looked healthy, because DuckDB-oracle value checks only run at
sf0.001/sf0.01 where AQE coalesces the range exchange to one partition
and the boundary-resampling bug could not express itself. This tool
closes that blind spot for the device families whose correctness is
partition-shape-dependent: cheap O(1)-output invariants that must hold
at ANY scale, run directly on the big derived corpora.

Invariants (each is a property the gate-SF oracles prove exactly; here
they witness the same algebra at decade scale):

- prefix ranks: over any grouped_prefix/partitioned_prefix consumer
  frame, global ranks are a permutation of 1..N and group ranks of
  1..N_g (checked as min==1, max==count, countDistinct==count — a
  permutation witness without materializing the frame).
- rrf: every fused rank >= 1 (the q184 corruption fired exactly here)
  and every rrf_score in (0, |signals|/(c+1)].
- cluster split: every cluster maps to exactly ONE split and the
  three fractions sum to 1.

Usage: python tools/scale_validate.py [sf_dir ...]
       (default: .scale_smoke/sf1 .scale_smoke/sf10)
Prints one PASS/FAIL line per (check, sf) and exits nonzero on FAIL.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from big_data_project_datapipeline_spark.functions import text as TX
from big_data_project_datapipeline_spark.functions.dedup import (
    cluster_aware_split,
)
from big_data_project_datapipeline_spark.functions.quality import rrf_fusion
from big_data_project_datapipeline_spark.operators.prefix import (
    group_rank_frame,
)
from big_data_project_datapipeline_spark.session import get_spark
from big_data_project_datapipeline_spark.tables import load_table


def _docs_features(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    tk = TX.tokens(F.col("text"))
    return d.select(
        "lang",
        "doc_id",
        F.size(tk).cast("long").alias("n_tokens"),
        (
            F.size(F.array_distinct(tk)).cast("double")
            / F.size(tk).cast("double")
        ).alias("ttr"),
    ).filter(F.col("n_tokens") > 0)


def check_prefix_ranks(spark, sf_dir) -> list[str]:
    """Permutation witness for grouped ranks over the q184-shaped
    frame (the exact frame that carried the sf10 corruption)."""
    feat = _docs_features(spark, sf_dir)
    problems = []
    for s in ("n_tokens", "ttr"):
        r = group_rank_frame(
            feat.select(
                F.col("lang").alias("grp"),
                F.col("doc_id").alias("item"),
                F.col(s),
            )
            .filter(F.col(s).isNotNull())
            .withColumn("__ns", -F.col(s)),
            ["grp"],
            ["__ns", "item"],
            group_rank_col="gr",
            group_count_col="gn",
        )
        agg = r.groupBy("grp").agg(
            F.min("gr").alias("lo"),
            F.max("gr").alias("hi"),
            F.countDistinct("gr").alias("nd"),
            F.count(F.lit(1)).alias("n"),
            F.max("gn").alias("gn"),
        )
        bad = agg.filter(
            (F.col("lo") != 1)
            | (F.col("hi") != F.col("n"))
            | (F.col("nd") != F.col("n"))
            | (F.col("gn") != F.col("n"))
        ).count()
        if bad:
            problems.append(f"prefix[{s}]: {bad} groups violate rank permutation")
    return problems


def check_rrf(spark, sf_dir) -> list[str]:
    feat = _docs_features(spark, sf_dir)
    out = rrf_fusion(
        feat, ["n_tokens", "ttr"], "doc_id", "lang", k=5, c=60
    )
    agg = out.agg(
        F.min("rank_n_tokens").alias("r1"),
        F.min("rank_ttr").alias("r2"),
        F.min("rrf_score").alias("smin"),
        F.max("rrf_score").alias("smax"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    problems = []
    if agg["n"] == 0:
        problems.append("rrf: empty output")
    if (agg["r1"] or 0) < 1 or (agg["r2"] or 0) < 1:
        problems.append(f"rrf: rank < 1 (r1={agg['r1']}, r2={agg['r2']})")
    if not (0.0 < (agg["smin"] or -1) and (agg["smax"] or 9) <= 2.0 / 61.0 + 1e-12):
        problems.append(f"rrf: score out of (0, 2/61] ({agg['smin']}, {agg['smax']})")
    return problems


def check_cluster_split(spark, sf_dir) -> list[str]:
    d = load_table(spark, sf_dir, "documents")
    out = cluster_aware_split(d, num_hashes=16, band_size=8, threshold=0.8)
    problems = []
    multi = (
        out.groupBy("cluster_root")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    if multi:
        problems.append(f"split: {multi} clusters straddle splits")
    total = out.count()
    per = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    if sum(per.values()) != total or total == 0:
        problems.append(f"split: fractions do not partition ({per} vs {total})")
    return problems


def check_pagerank_family(spark, sf_dir) -> list[str]:
    """Round-9 graph invariants (VERDICT r8 item 3): rank-vector
    algebra that must hold at ANY scale for q87 / q190 / q193 — node
    uniqueness, positivity (every node holds at least its teleport
    share; PPR non-seeds may sit at exactly 0), rank <= 1, and total
    mass == 1 up to ROUNDING (the symmetrized graphs have no dangling
    nodes, so each sweep preserves mass exactly; the output's
    per-node round(6) quantizes by up to 5e-7 per node, so the
    rounded mass may drift |n·5e-7| — at sf10's ~2M-node graphs the
    teleport share itself sits BELOW the quantization floor, ranks
    legitimately round to 0.0, and the rounded mass was measured at
    0.15 for q87. The bound scales with n; positivity is only
    asserted when the teleport floor survives rounding)."""
    import __spark_entry__ as E

    qs = E.queries()
    problems = []
    for name, lo_exclusive in (
        ("q87_pagerank", True),
        ("q190_weighted_pagerank", True),
        ("q193_personalized_pagerank", False),
    ):
        agg = (
            qs[name](spark, sf_dir)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("node").alias("nd"),
                F.min("pr").alias("lo"),
                F.max("pr").alias("hi"),
                F.sum("pr").alias("mass"),
            )
            .first()
        )
        if agg["n"] == 0 or agg["nd"] != agg["n"]:
            problems.append(f"{name}: node multiplicity ({agg['nd']} vs {agg['n']})")
            continue
        lo = -1.0 if agg["lo"] is None else agg["lo"]
        hi = 9.0 if agg["hi"] is None else agg["hi"]
        teleport_floor = 0.15 / agg["n"]
        lo_bad = (
            lo <= 0
            if lo_exclusive and teleport_floor >= 2e-6
            else lo < 0
        )
        if lo_bad or hi > 1.0:
            problems.append(f"{name}: rank out of range ({agg['lo']}, {agg['hi']})")
        if abs((agg["mass"] or 0.0) - 1.0) > max(0.01, agg["n"] * 5.1e-7):
            problems.append(f"{name}: total mass {agg['mass']} != 1")
    return problems


def check_kcore(spark, sf_dir) -> list[str]:
    """q192 at decade scale: independently recompute each surviving
    node's degree INSIDE the returned core (two semi-joins + one
    groupBy over the support graph) — it must equal the reported
    in-core degree and be >= k=2. This is the k-core definition
    checked from scratch, not via the operator's own fixpoint
    probe."""
    import __spark_entry__ as E

    core = E.queries()["q192_kcore"](spark, sf_dir)
    ed = E._copurchase_support_edges(spark, sf_dir).select("src", "dst")
    sym = ed.union(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    nodes = core.select("node")
    ind_deg = (
        sym.join(nodes.withColumnRenamed("node", "src"), "src", "left_semi")
        .join(nodes.withColumnRenamed("node", "dst"), "dst", "left_semi")
        .groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    bad = (
        core.join(ind_deg, "node", "left")
        .filter(
            F.col("d").isNull()
            | (F.col("d") != F.col("degree"))
            | (F.col("d") < 2)
        )
        .count()
    )
    n = core.count()
    problems = []
    if n == 0:
        problems.append("kcore: empty core at decade scale")
    if bad:
        problems.append(f"kcore: {bad}/{n} nodes violate in-core degree == reported >= k")
    return problems


def check_cc_isolates(spark, sf_dir) -> list[str]:
    """q189 at decade scale: the output covers the FULL part universe
    exactly once (every part id present, node uniqueness) and every
    singleton labels itself."""
    import __spark_entry__ as E

    out = E.queries()["q189_cc_isolates"](spark, sf_dir)
    parts = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node")
    )
    problems = []
    agg = out.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("node").alias("nd")
    ).first()
    if agg["n"] == 0 or agg["nd"] != agg["n"]:
        problems.append(f"isolates: node multiplicity ({agg['nd']} vs {agg['n']})")
    missing = parts.join(out.select("node"), "node", "left_anti").count()
    if missing:
        problems.append(f"isolates: {missing} part ids absent from the output")
    bad_single = (
        out.groupBy("component")
        .agg(F.count(F.lit(1)).alias("sz"), F.min("node").alias("lo"))
        .filter((F.col("sz") == 1) & (F.col("component") != F.col("lo")))
        .count()
    )
    if bad_single:
        problems.append(f"isolates: {bad_single} singletons mislabeled")
    return problems


def check_link_prediction(spark, sf_dir) -> list[str]:
    """q201 at decade scale: every emitted candidate is NON-adjacent
    (re-checked against an independently joined canonical edge set),
    u < v, common >= 1, jaccard in (0, 1], and the top-k cut holds."""
    import __spark_entry__ as E

    out = E.queries()["q201_link_prediction"](spark, sf_dir)
    canon = E._copurchase_support_edges(spark, sf_dir).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    problems = []
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("common_neighbors").alias("cmin"),
        F.min("jaccard").alias("jmin"),
        F.max("jaccard").alias("jmax"),
        F.sum(F.when(F.col("u") < F.col("v"), 0).otherwise(1)).alias("bad_uv"),
    ).first()
    if agg["n"] == 0 or agg["n"] > 100:
        problems.append(f"linkpred: bad row count {agg['n']}")
    if (agg["cmin"] or 0) < 1:
        problems.append(f"linkpred: common_neighbors < 1 ({agg['cmin']})")
    if not (0.0 < (agg["jmin"] or -1) and (agg["jmax"] or 9) <= 1.0):
        problems.append(f"linkpred: jaccard out of (0,1] ({agg['jmin']}, {agg['jmax']})")
    if agg["bad_uv"]:
        problems.append(f"linkpred: {agg['bad_uv']} rows not u < v")
    adjacent = out.join(canon, ["u", "v"], "left_semi").count()
    if adjacent:
        problems.append(f"linkpred: {adjacent} predicted links already edges")
    return problems


def check_bfs(spark, sf_dir) -> list[str]:
    """q202 at decade scale: the BFS recurrence re-proved from the
    edge set — dist-0 rows are EXACTLY the seed set, and every node
    at dist k > 0 has minimum neighbor distance k-1 (no skipped hop,
    no relaxation miss); dist within [0, 3]; node uniqueness."""
    import __spark_entry__ as E

    out = E.queries()["q202_seed_bfs_distance"](spark, sf_dir)
    seeds = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select(F.col("p_partkey").alias("node"))
        .distinct()
    )
    ed = E._copurchase_support_edges(spark, sf_dir)
    sym = ed.select("src", "dst").union(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    problems = []
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("node").alias("nd"),
        F.min("dist").alias("lo"),
        F.max("dist").alias("hi"),
    ).first()
    if agg["n"] == 0 or agg["nd"] != agg["n"]:
        problems.append(f"bfs: node multiplicity ({agg['nd']} vs {agg['n']})")
    lo = -1 if agg["lo"] is None else agg["lo"]
    hi = 9 if agg["hi"] is None else agg["hi"]
    if lo < 0 or hi > 3:
        problems.append(f"bfs: dist out of [0,3] ({agg['lo']}, {agg['hi']})")
    d0 = out.filter(F.col("dist") == 0).select("node")
    if d0.join(seeds, "node", "left_anti").count() or seeds.join(
        d0, "node", "left_anti"
    ).count():
        problems.append("bfs: dist-0 set != seed set")
    nbr = (
        out.filter(F.col("dist") > 0)
        .withColumnRenamed("node", "dst")
        .join(sym, "dst")
        .join(
            out.select(F.col("node").alias("src"), F.col("dist").alias("nd_dist")),
            "src",
        )
        .groupBy("dst", "dist")
        .agg(F.min("nd_dist").alias("best"))
    )
    bad = nbr.filter(F.col("best") != F.col("dist") - 1).count()
    reached_pos = out.filter(F.col("dist") > 0).count()
    covered = nbr.count()
    if bad or covered != reached_pos:
        problems.append(
            f"bfs: recurrence broken ({bad} wrong, {reached_pos - covered} without neighbors)"
        )
    return problems


def check_lpa(spark, sf_dir) -> list[str]:
    """q203 at decade scale: the output covers the symmetrized node
    universe exactly once and every label is an existing node id."""
    import __spark_entry__ as E

    out = E.queries()["q203_label_propagation"](spark, sf_dir)
    ed = E._copurchase_support_edges(spark, sf_dir)
    nodes = (
        ed.select(F.col("src").alias("node"))
        .union(ed.select(F.col("dst").alias("node")))
        .distinct()
    )
    problems = []
    agg = out.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("node").alias("nd")
    ).first()
    n_nodes = nodes.count()
    if agg["n"] != n_nodes or agg["nd"] != agg["n"]:
        problems.append(
            f"lpa: coverage broken ({agg['n']} rows, {agg['nd']} distinct, {n_nodes} nodes)"
        )
    alien = out.join(
        nodes.withColumnRenamed("node", "label"), "label", "left_anti"
    ).count()
    if alien:
        problems.append(f"lpa: {alien} labels are not node ids")
    return problems


def check_interval_concurrency(spark, sf_dir) -> list[str]:
    """q205's step frame at decade scale: sweep-line conservation —
    deltas sum to 0 (every open closes), concurrency never negative,
    and the final step lands at 0."""
    from big_data_project_datapipeline_spark.operators.intervals import (
        interval_concurrency,
    )

    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("last_ship"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("start"),
    )
    step = interval_concurrency(
        o.join(li, "l_orderkey"), "start", "last_ship"
    )
    agg = step.agg(
        F.sum("net").alias("net_total"),
        F.min("concurrent").alias("cmin"),
        F.max_by("concurrent", "ts").alias("last"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    problems = []
    if agg["n"] == 0:
        problems.append("sweep: empty step frame")
    if agg["net_total"] is None or agg["net_total"] != 0:
        problems.append(f"sweep: deltas sum to {agg['net_total']} != 0")
    if agg["cmin"] is None or agg["cmin"] < 0:
        problems.append(f"sweep: negative concurrency {agg['cmin']}")
    if agg["last"] is None or agg["last"] != 0:
        problems.append(f"sweep: final step {agg['last']} != 0")
    return problems


def check_rank_stats(spark, sf_dir) -> list[str]:
    """q208/q209 at decade scale. The strong witness is the
    self-correlation identity: spearman_corr(x, x) must be EXACTLY 1.0
    per group — it runs the full doubled-mid-rank device (collapse →
    group_rank_frame → join-back → moments) twice over decade-scale
    partition shapes, and any rank corruption of the round-8
    boundary-resampling class breaks the identity. Kruskal–Wallis
    invariants: H >= 0, tie-corrected H >= H (the divisor is <= 1),
    dof = levels − 1, and n equals an independent clean-row count."""
    from big_data_project_datapipeline_spark.functions.quality import (
        kruskal_wallis,
        spearman_corr,
    )

    problems = []
    li = load_table(spark, sf_dir, "lineitem")
    self_rho = spearman_corr(
        li, "l_extendedprice", "l_extendedprice", ["l_returnflag"]
    )
    bad_self = self_rho.filter(
        F.col("spearman_rho").isNull() | (F.col("spearman_rho") != 1.0)
    ).count()
    if bad_self:
        problems.append(
            f"spearman: {bad_self} groups where self-rho != 1.0"
        )
    rho = spearman_corr(
        li, "l_quantity", "l_extendedprice", ["l_returnflag"]
    )
    bad_range = rho.filter(
        F.col("spearman_rho").isNull()
        | (F.abs(F.col("spearman_rho")) > 1.0)
    ).count()
    if bad_range:
        problems.append(f"spearman: {bad_range} groups with |rho| > 1")
    ev = load_table(spark, sf_dir, "events")
    kw = kruskal_wallis(ev, "value", "event_type").first()
    n_clean = ev.filter(
        F.col("value").isNotNull()
        & ~F.isnan(F.col("value"))
        & F.col("event_type").isNotNull()
    ).count()
    if kw["n"] != n_clean:
        problems.append(f"kruskal: n {kw['n']} != clean rows {n_clean}")
    if kw["h"] is None or kw["h"] < 0:
        problems.append(f"kruskal: h {kw['h']} < 0")
    if kw["h_tie_corrected"] is None or kw["h_tie_corrected"] < kw["h"]:
        problems.append(
            f"kruskal: corrected {kw['h_tie_corrected']} < h {kw['h']}"
        )
    if kw["dof"] != kw["n_levels"] - 1:
        problems.append("kruskal: dof != n_levels - 1")
    return problems


def check_theil_sen(spark, sf_dir) -> list[str]:
    """q210 at decade scale: the pair-count law n_pairs =
    n_days·(n_days−1)/2 must hold exactly (a dropped or duplicated
    pair breaks it), and since consecutive days are >= 1 apart, every
    pairwise slope — hence the median — is bounded by the group's
    daily-mean range: |slope| <= vmax − vmin (independent recompute
    via plain avg; inequality with epsilon, so the float path
    difference is irrelevant)."""
    from big_data_project_datapipeline_spark.functions.quality import (
        theil_sen_trend,
    )

    ev = load_table(spark, sf_dir, "events")
    ts = theil_sen_trend(ev, "ts", "value", ["event_type"])
    bad_pairs = ts.filter(
        F.col("n_pairs")
        != (F.col("n_days") * (F.col("n_days") - 1) / 2).cast("long")
    ).count()
    problems = []
    if bad_pairs:
        problems.append(f"theil_sen: {bad_pairs} groups break pair law")
    daily = (
        ev.filter(F.col("value").isNotNull() & ~F.isnan(F.col("value")))
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.avg("value").alias("v"))
        .groupBy("event_type")
        .agg(
            (F.max("v") - F.min("v")).alias("vrange"),
        )
    )
    bad_bound = (
        ts.join(daily, "event_type")
        .filter(
            F.col("slope_per_day").isNotNull()
            & (
                F.abs(F.col("slope_per_day"))
                > F.col("vrange") + F.lit(1e-6)
            )
        )
        .count()
    )
    if bad_bound:
        problems.append(
            f"theil_sen: {bad_bound} slopes exceed the daily-range bound"
        )
    return problems


def check_cramers_v(spark, sf_dir) -> list[str]:
    """q211 at decade scale: V in [0,1] for every pair, n equals the
    table row count (every row lands in every pair's cells), dof =
    (r−1)(c−1), and the self-association identity — a column paired
    with its own copy must score V = 1.0 exactly (any cell/total
    mis-join deflates it)."""
    from big_data_project_datapipeline_spark.functions.quality import (
        cramers_v_matrix,
    )

    d = load_table(spark, sf_dir, "documents").withColumn(
        "lang_twin", F.col("lang")
    )
    out = cramers_v_matrix(d, ["lang", "source", "lang_twin"]).collect()
    n_rows = d.count()
    problems = []
    by_pair = {(r["col_x"], r["col_y"]): r for r in out}
    for key, r in by_pair.items():
        if r["n"] != n_rows:
            problems.append(f"cramers {key}: n {r['n']} != {n_rows}")
        if r["cramers_v"] is not None and not (
            0.0 <= r["cramers_v"] <= 1.0
        ):
            problems.append(f"cramers {key}: v {r['cramers_v']} out of range")
        if r["dof"] != (r["r_levels"] - 1) * (r["c_levels"] - 1):
            problems.append(f"cramers {key}: dof mismatch")
    twin = by_pair[("lang", "lang_twin")]
    if twin["cramers_v"] != 1.0:
        problems.append(
            f"cramers: self-association v {twin['cramers_v']} != 1.0"
        )
    return problems


def check_logistic(spark, sf_dir) -> list[str]:
    """q215 at decade scale: n equals an independent clean-row count
    per group, n_pos <= n, every β finite (a singular or diverging
    step would surface NaN/inf), and the train log-loss beats the
    null model's ln 2 — the decade corpora replicate sf0.1's label
    distribution, where three Newton steps comfortably clear it."""
    import math

    from big_data_project_datapipeline_spark.functions.quality import (
        logistic_irls,
    )

    li = load_table(spark, sf_dir, "lineitem")
    out = logistic_irls(
        li,
        F.col("l_returnflag") == "R",
        "l_discount",
        "l_quantity",
        ["l_linestatus"],
        n_iters=3,
    ).collect()
    clean = (
        li.filter(
            F.col("l_discount").isNotNull()
            & ~F.isnan(F.col("l_discount"))
            & F.col("l_quantity").isNotNull()
            & ~F.isnan(F.col("l_quantity"))
        )
        .groupBy("l_linestatus")
        .count()
    )
    counts = {r["l_linestatus"]: r["count"] for r in clean.collect()}
    problems = []
    for r in out:
        g = r["l_linestatus"]
        if r["n"] != counts.get(g):
            problems.append(f"logistic {g}: n {r['n']} != {counts.get(g)}")
        if not (0 <= r["n_pos"] <= r["n"]):
            problems.append(f"logistic {g}: n_pos {r['n_pos']} out of range")
        for b in ("beta0", "beta1", "beta2"):
            v = r[b]
            if v is None or math.isnan(v) or math.isinf(v):
                problems.append(f"logistic {g}: {b} = {v}")
        ll = r["avg_logloss"]
        if ll is None or not (0.0 < ll < math.log(2.0)):
            problems.append(f"logistic {g}: avg_logloss {ll}")
    if len(out) != len(counts):
        problems.append("logistic: group set mismatch")
    return problems


def check_naive_bayes(spark, sf_dir) -> list[str]:
    """q216 at decade scale: confusion-matrix conservation — the doc
    counts sum to the number of TOKENIZED documents (zero-token docs
    drop by contract), every predicted label is a real class, and no
    cell is negative or NULL."""
    from big_data_project_datapipeline_spark.functions.corpus import (
        naive_bayes_confusion,
    )
    from big_data_project_datapipeline_spark.functions import text as TXX

    d = load_table(spark, sf_dir, "documents")
    out = naive_bayes_confusion(d).collect()
    n_tokenized = d.filter(
        F.size(TXX.tokens(F.col("text"))) > 0
    ).count()
    classes = {r["lang"] for r in d.select("lang").distinct().collect()}
    problems = []
    total = sum(r["n_docs"] for r in out)
    if total != n_tokenized:
        problems.append(f"nb: confusion total {total} != {n_tokenized}")
    for r in out:
        if r["predicted"] not in classes:
            problems.append(f"nb: phantom class {r['predicted']}")
        if r["n_docs"] is None or r["n_docs"] <= 0:
            problems.append(f"nb: bad cell count {r['n_docs']}")
    return problems


def check_huber(spark, sf_dir) -> list[str]:
    """q219 at decade scale: n equals an independent clean-row count
    per group, scale is finite and non-negative, and every β is
    finite (a diverging or singular reweight would surface NaN/inf
    through the adjugate solve)."""
    import math

    from big_data_project_datapipeline_spark.functions.quality import (
        huber_irls,
    )

    li = load_table(spark, sf_dir, "lineitem")
    out = huber_irls(
        li,
        "l_extendedprice",
        "l_quantity",
        "l_discount",
        ["l_returnflag"],
        n_reweights=2,
    ).collect()
    clean = (
        li.filter(
            F.col("l_extendedprice").isNotNull()
            & ~F.isnan(F.col("l_extendedprice"))
            & F.col("l_quantity").isNotNull()
            & ~F.isnan(F.col("l_quantity"))
            & F.col("l_discount").isNotNull()
            & ~F.isnan(F.col("l_discount"))
        )
        .groupBy("l_returnflag")
        .count()
    )
    counts = {r["l_returnflag"]: r["count"] for r in clean.collect()}
    problems = []
    for r in out:
        g = r["l_returnflag"]
        if r["n"] != counts.get(g):
            problems.append(f"huber {g}: n {r['n']} != {counts.get(g)}")
        for col in ("scale", "b0", "b1", "b2"):
            v = r[col]
            if v is None or math.isnan(v) or math.isinf(v):
                problems.append(f"huber {g}: {col} = {v}")
        if r["scale"] is not None and r["scale"] < 0:
            problems.append(f"huber {g}: negative scale {r['scale']}")
    if len(out) != len(counts):
        problems.append("huber: group set mismatch")
    return problems


def check_skyline(spark, sf_dir) -> list[str]:
    """q221 at decade scale: the sweep's kept set must EQUAL the
    definitional dominance set, recomputed here via the O(n²)
    crossJoin the operator never runs (affordable because the
    supplier universe is dim-fixed at every decade) — the strongest
    possible witness that the strict-prefix-min device is correct
    over decade partition shapes."""
    from big_data_project_datapipeline_spark.operators.market import (
        skyline_2d,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_quantity",
        "l_shipdate",
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    m = j.groupBy(F.col("l_suppkey").alias("s")).agg(
        (
            F.sum(
                F.datediff(
                    F.to_date("l_shipdate"), F.to_date("o_orderdate")
                ).cast("long")
            ).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("x"),
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,8)")).cast(
                "double"
            )
            / F.sum(F.col("l_quantity").cast("decimal(28,8)")).cast(
                "double"
            )
        ).alias("y"),
    )
    m = m.persist()
    got = {r["s"] for r in skyline_2d(m, "x", "y").collect()}
    a = m.select(
        F.col("s").alias("ps"), F.col("x").alias("px"),
        F.col("y").alias("py"),
    )
    b = m.select(
        F.col("x").alias("qx"), F.col("y").alias("qy")
    )
    dominated = (
        a.crossJoin(b)
        .filter(
            (F.col("qx") <= F.col("px"))
            & (F.col("qy") <= F.col("py"))
            & (
                (F.col("qx") < F.col("px"))
                | (F.col("qy") < F.col("py"))
            )
        )
        .select("ps")
        .distinct()
    )
    want = {r["s"] for r in m.select("s").join(
        dominated, m["s"] == dominated["ps"], "left_anti"
    ).collect()}
    m.unpersist()
    problems = []
    if got != want:
        problems.append(
            f"skyline: sweep set != definitional set "
            f"(only-sweep {sorted(got - want)[:5]}, "
            f"only-def {sorted(want - got)[:5]})"
        )
    return problems




def check_kendall(spark, sf_dir) -> list[str]:
    """q223 at decade scale: the pair identity n_pairs =
    n_days(n_days-1)/2 per group, the partition identity
    C + D + ties_x + ties_y + ties_xy = n_pairs, and tau_b in [-1, 1]
    (NULL allowed only when a tie factor is 0)."""
    from big_data_project_datapipeline_spark.functions.quality import (
        kendall_tau_daily,
    )

    ev = load_table(spark, sf_dir, "events")
    out = kendall_tau_daily(ev, "ts", "value", ["event_type"]).collect()
    problems = []
    for r in out:
        nd = r["n_days"]
        if r["n_pairs"] != nd * (nd - 1) // 2:
            problems.append(f"kendall {r['event_type']}: pair identity")
        parts = (
            r["concordant"] + r["discordant"] + r["ties_x"]
            + r["ties_y"] + r["ties_xy"]
        )
        if parts != r["n_pairs"]:
            problems.append(f"kendall {r['event_type']}: partition identity")
        t = r["tau_b"]
        if t is None:
            if (r["n_pairs"] - r["ties_x"] - r["ties_xy"]) > 0 and (
                r["n_pairs"] - r["ties_y"] - r["ties_xy"]
            ) > 0:
                problems.append(
                    f"kendall {r['event_type']}: NULL tau with nonzero "
                    "factors"
                )
        elif not (-1.0 <= t <= 1.0):
            problems.append(f"kendall {r['event_type']}: tau {t} range")
    return problems


def check_fdr(spark, sf_dir) -> list[str]:
    """q224 at decade scale: ranks are exactly 1..m, m equals the
    row count, and the rejected set is DOWNWARD CLOSED in rank (the
    step-up contract: rank r rejected implies every smaller rank
    rejected)."""
    import __spark_entry__ as entrymod

    out = sorted(
        entrymod.queries()["q224_fdr_bh"](spark, sf_dir).collect(),
        key=lambda r: r["p_rank"],
    )
    problems = []
    m = len(out)
    if [r["p_rank"] for r in out] != list(range(1, m + 1)):
        problems.append("fdr: ranks not 1..m")
    if any(r["m_tests"] != m for r in out):
        problems.append("fdr: m_tests mismatch")
    seen_unrejected = False
    for r in out:
        if not r["rejected"]:
            seen_unrejected = True
        elif seen_unrejected:
            problems.append(f"fdr: rejected rank {r['p_rank']} above an "
                            "unrejected one")
            break
    return problems


def check_negative_sampling(spark, sf_dir) -> list[str]:
    """q227 at decade scale: the [lo, hi) ranges TILE the total mass
    exactly in token order (hi(i) == lo(i+1), first lo == 0 — exact
    equality, every number derives from the same scaled integers) and
    probabilities lie in [0, 1]."""
    from big_data_project_datapipeline_spark.functions.corpus import (
        negative_sampling_table,
    )

    d = load_table(spark, sf_dir, "documents")
    rows = sorted(
        negative_sampling_table(d).collect(), key=lambda r: r["token"]
    )
    problems = []
    if not rows:
        return ["negsamp: empty table"]
    if rows[0]["lo"] != 0.0:
        problems.append("negsamp: first lo != 0")
    for a, b in zip(rows, rows[1:]):
        if a["hi"] != b["lo"]:
            problems.append(f"negsamp: gap at {b['token']}")
            break
    for r in rows:
        if not (0.0 <= r["prob"] <= 1.0):
            problems.append(f"negsamp: prob {r['prob']} range")
            break
    return problems


def check_modularity(spark, sf_dir) -> list[str]:
    """q226 at decade scale, against an INDEPENDENT recount of the
    support graph: sum(degree_sum) == 2m, sum(inner_edges) <= m,
    sum(contribution) == modularity within the stacked quantization
    (communities x 1e-9 + 1e-6), and Q in [-0.5, 1]."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as FF

    out = entrymod.queries()["q226_lpa_modularity"](spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(FF.col("l_orderkey").alias("k"),
                  FF.col("l_partkey").alias("src"))
    b = op.select(FF.col("l_orderkey").alias("k"),
                  FF.col("l_partkey").alias("dst"))
    m = (
        a.join(b, "k")
        .filter(FF.col("src") < FF.col("dst"))
        .groupBy("src", "dst")
        .agg(FF.count(FF.lit(1)).alias("n"))
        .filter(FF.col("n") >= 2)
        .count()
    )
    problems = []
    if sum(r["degree_sum"] for r in out) != 2 * m:
        problems.append("modularity: sum(degree) != 2m")
    if sum(r["inner_edges"] for r in out) > m:
        problems.append("modularity: inner edges exceed m")
    q = out[0]["modularity"]
    tol = len(out) * 1e-9 + 1e-6
    if abs(sum(r["contribution"] for r in out) - q) > tol:
        problems.append("modularity: contributions do not refold to Q")
    if not (-0.5 <= q <= 1.0):
        problems.append(f"modularity: Q {q} out of range")
    return problems


def check_gini_and_batched_bpe(spark, sf_dir) -> list[str]:
    """Round-11 additions at decade scale. q232: Gini in [0, (n-1)/n],
    top-decile share in (0, 1], and the share can never sit below the
    uniform floor ceil(n/10)/n (the top decile holds AT LEAST its
    proportional mass by construction of the descending cut). q233:
    within a round ranks are count-ordered; across rounds the rank-1
    winner counts are non-increasing (a pair created by a round's
    merges occurs at most that round's winner count times — the q228
    argument batch-wise)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    problems = []
    for r in qs["q232_token_gini"](spark, sf_dir).collect():
        n = r["n_types"]
        if not (0.0 <= r["gini"] <= (n - 1) / n + 1e-9):
            problems.append(f"gini: {r['source']} out of range {r['gini']}")
            break
        floor_share = -(-n // 10) / n  # ceil(n/10)/n
        if not (floor_share - 1e-6 <= r["top_decile_share"] <= 1.0):
            problems.append(
                f"gini: {r['source']} top share {r['top_decile_share']} "
                f"below uniform floor {floor_share}"
            )
            break
    rows = sorted(
        qs["q233_bpe_train_batched"](spark, sf_dir).collect(),
        key=lambda r: (r["round"], r["rank"]),
    )
    if not rows:
        problems.append("batched bpe: no merges learned")
    by_round: dict[int, list] = {}
    for r in rows:
        by_round.setdefault(r["round"], []).append(r)
    prev_top = None
    for rnd in sorted(by_round):
        batch = by_round[rnd]
        counts = [r["pair_count"] for r in batch]
        if counts != sorted(counts, reverse=True):
            problems.append(f"batched bpe: round {rnd} ranks not count-ordered")
        if prev_top is not None and counts[0] > prev_top:
            problems.append(
                f"batched bpe: round {rnd} winner count rose "
                f"{prev_top} -> {counts[0]}"
            )
        prev_top = counts[0]
    return problems


def check_c4_and_bpe(spark, sf_dir) -> list[str]:
    """q222/q228 at decade scale: the line-rule counts partition
    n_lines per doc and text_clean is empty iff nothing was kept;
    the learned BPE merge counts are non-increasing across rounds
    (a pair created by merge r occurs at most pair_count(r) times,
    and round r's winner was the max — so the next max cannot rise)."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    problems = []
    bad = (
        qs["q222_c4_line_filter"](spark, sf_dir)
        .filter(
            (F.col("n_kept") + F.col("n_short") + F.col("n_no_punct")
             + F.col("n_boilerplate") + F.col("n_brace"))
            != F.col("n_lines")
        )
        .count()
    )
    if bad:
        problems.append(f"c4: {bad} docs fail the rule partition")
    incon = (
        qs["q222_c4_line_filter"](spark, sf_dir)
        .filter(
            ((F.col("n_kept") == 0) & (F.col("text_clean") != ""))
            | ((F.col("n_kept") > 0) & (F.col("text_clean") == ""))
        )
        .count()
    )
    if incon:
        problems.append(f"c4: {incon} docs break the kept/text contract")
    merges = sorted(
        qs["q228_bpe_train"](spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    if not merges:
        problems.append("bpe: no merges learned")
    for x, y in zip(merges, merges[1:]):
        if y["pair_count"] > x["pair_count"]:
            problems.append(
                f"bpe: count rose {x['pair_count']} -> {y['pair_count']}"
            )
            break
    curve = sorted(
        qs["q230_bpe_compression"](spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    totals = [r["total_symbols"] for r in curve]
    if not all(a > b for a, b in zip(totals, totals[1:])):
        problems.append("bpe: total_symbols not strictly decreasing")
    return problems


CHECKS = [
    ("prefix_ranks", check_prefix_ranks),
    ("rrf", check_rrf),
    ("cluster_split", check_cluster_split),
    ("pagerank_family", check_pagerank_family),
    ("kcore", check_kcore),
    ("cc_isolates", check_cc_isolates),
    # round-9 second wave
    ("link_prediction", check_link_prediction),
    ("bfs", check_bfs),
    ("lpa", check_lpa),
    ("interval_sweep", check_interval_concurrency),
    # round-9 third wave
    ("rank_stats", check_rank_stats),
    ("theil_sen", check_theil_sen),
    ("cramers_v", check_cramers_v),
    ("logistic", check_logistic),
    ("naive_bayes", check_naive_bayes),
    ("huber", check_huber),
    ("skyline", check_skyline),
    # round-10 additions
    ("kendall", check_kendall),
    ("fdr", check_fdr),
    ("negative_sampling", check_negative_sampling),
    ("modularity", check_modularity),
    ("c4_and_bpe", check_c4_and_bpe),
    # round-11 additions
    ("gini_and_batched_bpe", check_gini_and_batched_bpe),
]


def main() -> int:
    # args: [sf_dir ...] [--only name1,name2]
    args = sys.argv[1:]
    only: set[str] = set()
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf_dirs = args or [".scale_smoke/sf1", ".scale_smoke/sf10"]
    spark = get_spark(app_name="scale-validate")
    failures = 0
    for sf_dir in sf_dirs:
        for name, fn in CHECKS:
            if only and name not in only:
                continue
            problems = fn(spark, sf_dir)
            if problems:
                failures += 1
                print(f"FAIL {name} @ {sf_dir}: " + "; ".join(problems))
            else:
                print(f"PASS {name} @ {sf_dir}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
