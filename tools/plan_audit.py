"""Physical-plan audit — the scale-discipline gate.

Runs the headline queries, captures their executed plans, and asserts the
invariants that make them viable at 100 TB:

  A1  approx-funnel corpus scan prunes to (doc_id, code) — the residual
      column is never read before the decompress-budget cut (Q6 contract,
      SURVEY.md §2.4 / search.rs:305-324's codes-only pass).
  A2  metadata filters reach the Parquet scan (DataFilters/PushedFilters
      non-empty on the documents scan of the filtered entry).
  A3  keyword search joins the (small) query-term and df sides as broadcast
      joins — the postings corpus never shuffles by doc.
  A4  no CartesianProduct outside the rerank's intended bounded
      (uniq_vecs × query_tokens) cross join.
  A5  relational aggregation entries run inside WholeStageCodegen.

Writes PLANS.md (scan schemas, join strategies, codegen presence per query)
and exits non-zero if any invariant fails.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "plaid_search_topk",
    "plaid_filtered_topk",
    "filtered_search_topk",
    "bm25_topk",
    "bm25_pruned_topk",
    "hybrid_relative_topk",
    "dedup_minhash_lsh",
    "dedup_embedding",
    "simhash_fingerprints",
    "pricing_summary",
    "events_sessions",
    "cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_clusters",
    "perplexity_proxy",
    "pack_sequences",
    "bpe_pair_counts",
    "curate_corpus",
    "mmr_topk",
    "dsir_select",
    "duplicate_spans",
    "temperature_resample",
    "chunk_documents",
    "events_sliding",
    "events_asof",
    "ir_eval_bm25",
    "scrub_spans",
    "span_corrupt",
    "events_rolling",
    "dedup_bloom",
    "maxsim_brute_topk",
    "bm25_phrase_topk",
    "code_search_topk",
    "code_search_approx_topk",
    "code_search_filtered_topk",
    "code_search_filtered_approx_topk",
]


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scans(plan: str) -> list[str]:
    return [ln.strip() for ln in plan.splitlines() if "FileScan" in ln]


def _scan_table(s: str) -> str:
    """Last path component of a FileScan's location, normalized to the
    TABLE dir when the listed path is a partition dir (…/units/ub=3)."""
    m = re.search(r"Location: \w+\(\d+ paths?\)\[([^\]]+)", s)
    parts = (m.group(1) if m else "?").rstrip("/").split("/")
    return parts[-2] if re.match(r"^\w+=", parts[-1]) and len(parts) > 1 \
        else parts[-1]


def summarize(plan: str) -> dict:
    return {
        "scans": [
            {
                "path": _scan_table(s),
                # bucketed catalog tables print as "FileScan parquet db.table[cols]"
                "columns": (re.search(r"FileScan \w+(?: [\w.$]+)?\s*\[([^\]]*)\]", s) or [None, "?"])[1],
                "pushed": "DataFilters: [" in s and "DataFilters: []" not in s,
            }
            for s in scans(plan)
        ],
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "cartesian": plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin"),
        # codegen stages print as "*(N) Operator" in executedPlan strings
        "codegen": bool(re.search(r"\*\(\d+\)", plan)) or "WholeStageCodegen" in plan,
        "exchanges": plan.count("Exchange "),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from next_plaid_spark import queries as q
    from next_plaid_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # AQE wraps un-executed plans in AdaptiveSparkPlan(isFinalPlan=false),
    # which hides codegen annotation until runtime; the audit inspects the
    # static plan, so disable it here (planning invariants are unchanged)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    registry = q.queries()

    failures: list[str] = []
    sections: list[str] = []

    for name in AUDITED:
        df = registry[name](spark, sf_dir)
        plan = plan_of(df)
        s = summarize(plan)
        sections.append(
            f"## {name}\n\n"
            + "\n".join(
                f"- scan `{sc['path']}` → `[{sc['columns']}]`"
                + (" (filters pushed)" if sc["pushed"] else "")
                for sc in s["scans"]
            )
            + f"\n- joins: {s['broadcast_joins']} broadcast, "
            f"{s['sortmerge_joins']} sort-merge, {s['cartesian']} nested-loop/cartesian"
            f"\n- shuffles (Exchange): {s['exchanges']}"
            f"\n- whole-stage codegen: {'yes' if s['codegen'] else 'no'}\n"
        )

        # A1: the approximate stage must read codes without residuals —
        # the precomputed per-doc codes artifact (legacy doc_codes dir or
        # the merged doc_stats table, column-pruned) or a residual-free
        # tokens scan; rerank-stage tokens scans legitimately read residual
        if name in ("plaid_search_topk", "plaid_filtered_topk"):
            approx_ok = any(
                sc["path"] in ("doc_codes", "doc_stats") and "codes" in sc["columns"]
                for sc in s["scans"]
            ) or any(
                sc["path"] in ("tokens", "tokens_bucketed")
                and "residual" not in sc["columns"]
                for sc in s["scans"]
            )
            if not approx_ok:
                failures.append(f"A1 {name}: approx stage reads residuals (no codes-only scan)")
        # A1b: doc_stats readers must column-prune — a scan pulling the
        # codes arrays alongside num_tokens means a doclens consumer is
        # dragging the (large) codes column through the scan
        for sc in s["scans"]:
            if sc["path"] == "doc_stats" and "codes" in sc["columns"] \
                    and "num_tokens" in sc["columns"]:
                failures.append(f"A1b {name}: doc_stats scan not column-pruned ({sc['columns']})")
        # A2: filtered entries push metadata predicates into the scan
        if name in ("plaid_filtered_topk", "filtered_search_topk"):
            doc_scans = [sc for sc in s["scans"] if "documents" in sc["path"]]
            if not any(sc["pushed"] for sc in doc_scans):
                failures.append(f"A2 {name}: metadata filter not pushed to documents scan")
        # A3: keyword search keeps the corpus un-shuffled-by-doc via broadcasts
        if name == "bm25_topk" and s["broadcast_joins"] < 2:
            failures.append("A3 bm25_topk: query-term/df sides not broadcast")
        # A3b (r12): the MaxScore prune's candidate cut must be a broadcast
        # LEFT-SEMI on (query_id, doc_id) — a shuffled semi would re-move
        # the very postings volume the prune exists to keep out of the
        # exchange; and the postings scans stay term-pushdown-pruned
        if name == "bm25_pruned_topk":
            if s["broadcast_joins"] < 2:
                failures.append(
                    "A3b bm25_pruned_topk: prune sides not broadcast")
            if "LeftSemi" in plan and "BroadcastHashJoin" not in plan:
                failures.append(
                    "A3b bm25_pruned_topk: candidate semi-join not broadcast")
            if s["cartesian"]:
                failures.append("A3b bm25_pruned_topk: cartesian in prune plan")
        # A4: no unintended cartesian products
        if name in ("bm25_topk", "dedup_minhash_lsh", "dedup_embedding",
                    "simhash_fingerprints", "pricing_summary",
                    "events_sessions", "ann_lsh_topk", "ann_ivf_topk",
                    "duplicate_spans", "chunk_documents", "events_sliding",
                    "events_asof", "ir_eval_bm25", "scrub_spans",
                    "span_corrupt", "events_rolling") \
                and s["cartesian"]:
            failures.append(f"A4 {name}: unexpected cartesian/nested-loop join")
        # A9: temperature_resample's only nested-loops are the 1-row scalar
        # broadcast (Σ n^α) and the |sources|-row rate-table broadcast
        if name == "temperature_resample" and s["cartesian"] > 2:
            failures.append(
                f"A9 temperature_resample: {s['cartesian']} nested-loops "
                "(expected ≤2 bounded scalar/rate broadcasts)")
        # A11: the as-of join is ONE shuffle (the per-key window) and no
        # range join — a second exchange or any nested-loop means Spark
        # fell back to the O(|L|·|R|) plan the operator exists to avoid
        if name == "events_asof" and s["exchanges"] != 1:
            failures.append(
                f"A11 events_asof: {s['exchanges']} exchanges (expected exactly 1)")
        # A13: the brute-force kernel is one corpus scan: groupBy(doc) +
        # rank window + the vocab-distinct exchange(s) of the inline
        # synthetic encode (vocab-bounded). Any cartesian or sort-merge
        # join means the (query × doc) pair-shuffle plan crept back.
        # Counted precisely as HASH exchanges only: the raw "Exchange "
        # string count also matched BroadcastExchange (not a shuffle) and
        # the harness's explicit RoundRobin input spreads, which made the
        # gate flap with cache/materialization order (r9 finding). The
        # legitimate hash exchanges: groupBy(doc_id), the per-query rank
        # window (query_id), and ≤2 vocab-distinct (token) exchanges —
        # only the doc_id one is corpus-sized, and it IS the operator.
        if name == "maxsim_brute_topk":
            if s["cartesian"]:
                failures.append("A13 maxsim_brute_topk: cartesian/nested-loop join")
            if s["sortmerge_joins"]:
                failures.append("A13 maxsim_brute_topk: sort-merge join (pair shuffle)")
            hash_ex = plan.count("Exchange hashpartitioning")
            if hash_ex > 4:
                failures.append(
                    f"A13 maxsim_brute_topk: {hash_ex} hash exchanges (expected ≤4)")
        # A14: phrase search broadcasts the (small) query phrase table —
        # the positional postings never shuffle by doc, and there is no
        # n-way positional self-join
        if name == "bm25_phrase_topk":
            if s["cartesian"]:
                failures.append("A14 bm25_phrase_topk: cartesian/nested-loop join")
            if s["broadcast_joins"] < 2:
                failures.append(
                    "A14 bm25_phrase_topk: query-side tables not broadcast")
        # A16: code search serves from the PREBUILT CodeIndex — the
        # corpus-side vectors come from a stored index scan (never a
        # per-query re-encode of the unit table), the units scans are
        # column-pruned to the join/filter columns (embed_text/docstring
        # in a scan would mean the embed text is re-derived per query),
        # and there is no cartesian join or row-at-a-time Python UDF
        if name in ("code_search_topk", "code_search_approx_topk",
                    "code_search_filtered_topk",
                    "code_search_filtered_approx_topk"):
            if s["cartesian"]:
                failures.append(f"A16 {name}: cartesian/nested-loop join")
            for sc in s["scans"]:
                if sc["path"] == "units" and (
                        "embed_text" in sc["columns"]
                        or "docstring" in sc["columns"]):
                    failures.append(
                        f"A16 {name}: units scan not pruned ({sc['columns']})")
            if "BatchEvalPython" in plan:
                failures.append(f"A16 {name}: row-at-a-time Python UDF")
            # r15: the returned plan is the ranking tail over the two
            # COLLECTED k-bounded legs (guide §3.3 plan truncation) — the
            # stored-index and pushdown invariants now live in the LEG
            # plans, audited once below (A16-legs); here we pin the
            # truncated architecture itself
            if "LocalTableScan" not in plan:
                failures.append(
                    f"A16 {name}: expected collected k-bounded legs "
                    "(LocalTableScan) feeding the ranking tail")

        # A5: aggregation entries stay in codegen
        if name in ("pricing_summary", "events_sessions", "simhash_fingerprints") and not s["codegen"]:
            failures.append(f"A5 {name}: no WholeStageCodegen span")
        # A8: mmr's only nested-loop is the documented exact-cosine
        # candidate crossJoin (broadcast query side, bounded)
        if name == "mmr_topk" and s["cartesian"] > 1:
            failures.append(f"A8 mmr_topk: {s['cartesian']} nested-loops (expected only the cosine candidate crossJoin)")
        # A8b: DSIR's top-N must be TakeOrderedAndProject (per-partition
        # heaps), never a global sort; its nested-loops are only the three
        # 1-row scalar broadcasts (V, t_tot, r_tot)
        if name == "dsir_select":
            if "TakeOrderedAndProject" not in plan:
                failures.append("A8b dsir_select: top-N is not TakeOrderedAndProject")
            if s["cartesian"] > 3:
                failures.append(f"A8b dsir_select: {s['cartesian']} nested-loops (expected 3 scalar broadcasts)")
        # A7: the packing prefix sum must never serialize the corpus —
        # at most ONE SinglePartition exchange (the |buckets|-row cumsum);
        # a second would mean a corpus-wide ORDER BY window crept in
        if name in ("pack_sequences", "curate_corpus"):
            sp = plan.count("Exchange SinglePartition")
            if sp > 1:
                failures.append(
                    f"A7 {name}: {sp} single-partition exchanges "
                    "(corpus-wide window suspected)"
                )

    # A6: colgrep ranking builds lazily — no driver collects mid-plan
    # (code_units isn't a driver table, so audit over an inline fixture)
    units = spark.createDataFrame(
        [(i, f"fn_{i}", f"src/m_{i % 3}.py", "Function", 1, 9, f"def fn_{i}()",
          None, None, [], f"def fn_{i}(): pass")
         for i in range(24)],
        "unit_id long, name string, file string, unit_type string, line int, "
        "end_line int, signature string, docstring string, parent_class string, "
        "calls array<string>, code string",
    )
    from next_plaid_spark.operators.colgrep import apply_ranking

    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup(None) or [])
    import pyspark.sql.functions as SF

    ranked = apply_ranking(
        units.select("unit_id", SF.lit(1.0).alias("score")), units, "fn source",
        top_k=5,
    )
    jobs_after = len(tracker.getJobIdsForGroup(None) or [])
    rk_plan = plan_of(ranked)
    rk = summarize(rk_plan)
    if jobs_after != jobs_before:
        failures.append("A6 apply_ranking: driver job launched during plan construction")
    if rk["cartesian"]:
        failures.append("A6 apply_ranking: cartesian/nested-loop join")
    if "BatchEvalPython" in rk_plan or "PythonUDF" in rk_plan:
        failures.append("A6 apply_ranking: row-at-a-time Python UDF in plan")
    sections.append(
        "## apply_ranking (colgrep R1-R5, inline fixture)\n\n"
        f"- lazy construction: {'yes' if jobs_after == jobs_before else 'NO'}\n"
        f"- joins: {rk['broadcast_joins']} broadcast, {rk['sortmerge_joins']} "
        f"sort-merge, {rk['cartesian']} nested-loop/cartesian\n"
        f"- row-Python-UDF-free: {'yes' if 'BatchEvalPython' not in rk_plan else 'NO'}\n"
    )

    # A12: IVF skew probe (SURVEY §7) — a Zipfian cell distribution (hot
    # clusters hold most docs) must not blow up the funnel wall vs a
    # uniform corpus of identical size. The broadcast path scans candidate
    # docs doc-parallel (no per-cell shuffle), so measured skew tolerance
    # is the invariant — a serialization on hot cells would show here.
    try:
        import tempfile as _tf
        import time as _time

        from next_plaid_spark.encoding import clustered_token_corpus
        from next_plaid_spark.plans.builder import IndexBuilder
        from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams

        walls = {}
        for label, wts in (("uniform", None), ("zipf", "zipf")):
            toks, _ = clustered_token_corpus(
                spark, n_docs=1500, tokens_per_doc=6, dim=8, n_clusters=48,
                seed=13, cluster_weights=wts,
            )
            toks = toks.cache()
            toks.count()
            sidx = IndexBuilder(spark, k=64).build(
                toks, _tf.mkdtemp(prefix=f"audit_skew_{label}_") + "/idx"
            )
            qt = toks.filter(SF.col("doc_id") % 15 == 0).select(
                SF.col("doc_id").alias("query_id"), "token_idx", "vec"
            ).cache()
            s = BatchSearcher(sidx, SearchParams(top_k=10))
            s.search(qt).count()  # warm (caches, codegen)
            t0 = _time.time()
            s.search(qt).count()
            walls[label] = _time.time() - t0
            toks.unpersist()
            qt.unpersist()
        ratio = walls["zipf"] / max(walls["uniform"], 1e-9)
        if ratio > 2.5:
            failures.append(
                f"A12 skew: zipf/uniform funnel wall ratio {ratio:.2f} > 2.5 "
                "(hot IVF cells serialize the search)")
        sections.append(
            "## skew probe (A12, Zipfian vs uniform IVF cells)\n\n"
            f"- uniform corpus search wall: {walls['uniform']:.2f}s\n"
            f"- zipf corpus search wall: {walls['zipf']:.2f}s\n"
            f"- ratio: {ratio:.2f} (gate ≤ 2.5)\n"
        )
    except Exception as e:  # audit must still write its report
        failures.append(f"A12 skew probe errored: {e}")

    # A15: doc_id-bucketed token storage (index_store.write_index
    # bucket_tokens) must REMOVE the corpus-sized per-doc exchange from the
    # funnel's search plan: the bucket spec satisfies the rerank's
    # required distribution at scan time, so the Exchange directly above
    # the tokens read disappears. The remaining doc_id exchanges operate
    # on survivor-bounded sets (≤ n_full_scores · queries rows), which is
    # the 100 TB claim — the ONLY corpus-sized shuffle in the search path
    # is the one bucketing eliminates.
    try:
        import tempfile as _tf3

        from next_plaid_spark.encoding import encode_queries
        from next_plaid_spark.plans.builder import IndexBuilder as _IB15
        from next_plaid_spark.plans.searcher import (
            BatchSearcher as _BS15,
            SearchParams as _SP15,
        )

        # _plaid_index is the BUCKETED build since r9, so the A/B needs
        # an explicit unbucketed control built from the same tokens
        plain_idx = _IB15(spark, nbits=4, seed=42, bucket_tokens=None).build(
            q._doc_tokens(spark, sf_dir),
            _tf3.mkdtemp(prefix="audit_uidx_") + "/idx",
        )
        bidx = _IB15(spark, nbits=4, seed=42, bucket_tokens=8).build(
            q._doc_tokens(spark, sf_dir),
            _tf3.mkdtemp(prefix="audit_bidx_") + "/idx",
        )
        bqt = encode_queries(
            q._t(spark, sf_dir, "documents").filter(SF.col("doc_id") < 50)
            .select(SF.col("doc_id").alias("query_id"), "text")
        )
        ex_counts = {}
        for label, idx_ in (("plain", plain_idx), ("bucketed", bidx)):
            p = plan_of(_BS15(idx_, _SP15(top_k=10, n_full_scores=256))
                        .search(bqt))
            ex_counts[label] = sum(
                1 for ln in p.splitlines()
                if "Exchange hashpartitioning(doc_id" in ln)
        if ex_counts["bucketed"] >= ex_counts["plain"]:
            failures.append(
                f"A15 bucketed tokens: per-doc exchange count did not drop "
                f"(plain {ex_counts['plain']}, bucketed {ex_counts['bucketed']})")
        sections.append(
            "## bucketed token storage (A15, write-once shuffle payoff)\n\n"
            f"- per-doc (`hashpartitioning(doc_id…)`) exchanges in the "
            f"funnel search plan: plain parquet {ex_counts['plain']}, "
            f"doc_id-bucketed {ex_counts['bucketed']}\n"
            "- the eliminated exchange is the CORPUS-sized one directly "
            "above the tokens scan (the rerank stage's required "
            "distribution, satisfied by the bucket spec at read time); "
            "the survivors operate on rank-cut candidate sets bounded by "
            "n_full_scores · |queries|\n"
            "- measured wall at sf0.1: see BENCH extras "
            "`batch500_unbucketed_wall` vs `batch500_bucketed_wall` and "
            "stats `batch500_*_exchanges`\n"
        )
    except Exception as e:
        failures.append(f"A15 bucketed-tokens probe errored: {e}")

    status = "ALL INVARIANTS HOLD" if not failures else "FAILURES:\n" + "\n".join(
        f"- {f}" for f in failures
    )
    # A16-legs (r15): the code_search entries collect their semantic and
    # keyword legs during construction, so the stored-index discipline is
    # asserted on the leg DataFrames directly — the funnel leg must scan
    # the PREBUILT index tokens (never re-encode the unit table per
    # query), and the F10/F11 subset must reach the units scan as a
    # pushed predicate
    import dataclasses as _dc

    from next_plaid_spark.encoding import encode_queries
    from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams
    from next_plaid_spark.session import local_df

    ci = q._code_index(spark, sf_dir)
    qt = encode_queries(
        local_df(spark, [(0, q._code_query_text(spark, sf_dir))],
                 "query_id long, text string"),
        dim=ci.meta["dim"], max_tokens=ci.meta["query_max_tokens"])
    _searcher = BatchSearcher(ci.plaid)
    for label, subset in (
            ("unfiltered", None),
            ("filtered", ci._subset(q.CODE_FILTER_REGEX,
                                    q.CODE_FILTER_GLOB, None))):
        sem = _searcher.search(
            qt, subset=subset,
            params=_dc.replace(SearchParams(), top_k=200))
        leg_plan = plan_of(sem)
        leg = summarize(leg_plan)
        if not any(sc["path"].startswith("tokens") for sc in leg["scans"]):
            failures.append(
                f"A16-legs ({label}): semantic leg not served from the "
                "stored index tokens (per-query corpus re-encode suspected)")
        if subset is not None:
            sub_scans = [sc for sc in leg["scans"]
                         if sc["path"] == "units" and "code" in sc["columns"]]
            if not (sub_scans and all(sc["pushed"] for sc in sub_scans)):
                failures.append(
                    "A16-legs (filtered): F10/F11 subset predicate "
                    "not pushed into the units scan")
        _searcher.release()
    sections.append(
        "## code_search semantic leg (A16-legs, audited pre-collection)\n\n"
        "- the four code_search entries collect their k-bounded legs at\n"
        "  construction (r15); the stored-index scan and subset pushdown\n"
        "  are asserted on the leg plans above, the ranking tail on the\n"
        "  returned plans.\n")


    doc = (
        "# PLANS — physical-plan audit (generated by tools/plan_audit.py)\n\n"
        f"Scale factor dir: `{sf_dir}`. Invariants A1–A5 are described in the "
        "tool's docstring; this file is regenerated per audit run.\n\n"
        f"**{status}**\n\n" + "\n".join(sections)
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write(doc)
    print(status)
    print(f"wrote {out}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
