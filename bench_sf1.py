"""sf1 scale-replication campaign (VERDICT r4 #5): drive the flagship at
80M sequences and the top-10-cost trackers over 10×-replicated sf1
tables, recording wall time, PEAK object-store usage, which scale guards
engage, and eff(2→8) at the sf1 volume.

The sandbox has no /root/testdata/sf1, so the tables are synthesized
DETERMINISTICALLY from sf0.1: each table is replicated 10× with disjoint
id offsets (copy c shifts every key column by c·stride), which preserves
per-key distribution shape while growing row counts and key cardinality
10× — exactly what the fold/packer/edge guards key on.  No external
data; /dev/shm only (this VM's disk sustains ~28 MB/s and would poison
timings).

Run:  python bench_sf1.py            → one JSON line
      python bench_sf1.py --scaling  → eff(2→8) at 80M sequences only
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import threading
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF01 = "/root/testdata/sf0.1"
SF1_DIR = "/dev/shm/tj_sf1"
SEQ_N = int(os.environ.get("GRAFT_SF1_SEQ", "80000000"))
COPIES = 10

# key columns shifted per copy (disjoint id spaces per replica).  A key
# DOMAIN spans every column that joins against it (custkey appears in
# customer AND orders AND events.user_id), so each domain gets ONE
# stride computed over ALL its columns across tables — per-table strides
# would break FK relations between the replicated copies.
_TABLE_KEYS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "custkey"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}


def _domain_strides() -> dict[str, int]:
    mx: dict[str, int] = {}
    for name, keys in _TABLE_KEYS.items():
        if not keys:
            continue
        cols = [k for k in keys
                if k in pq.read_schema(
                    os.path.join(SF01, f"{name}.parquet")).names]
        t = pq.read_table(os.path.join(SF01, f"{name}.parquet"),
                          columns=cols)
        for col, dom in keys.items():
            if col not in cols:
                continue
            v = pc.max(t[col]).as_py()
            if v is not None:
                mx[dom] = max(mx.get(dom, 0), int(v))
    strides = {}
    for dom, m in mx.items():
        s = 1
        while s <= m:
            s *= 10
        strides[dom] = s
    return strides


def build_sf1_tables() -> None:
    os.makedirs(SF1_DIR, exist_ok=True)
    manifest = os.path.join(SF1_DIR, "_MANIFEST.json")
    want = {"copies": COPIES, "src": SF01, "v": 2}
    if os.path.exists(manifest):
        with open(manifest) as f:
            if json.load(f) == want:
                return
    strides = _domain_strides()
    for name, keys in _TABLE_KEYS.items():
        src = pq.read_table(os.path.join(SF01, f"{name}.parquet"))
        keys = {k: d for k, d in keys.items() if k in src.column_names}
        if not keys:  # dimension enums (region/nation): keep as-is
            pq.write_table(src, os.path.join(SF1_DIR, f"{name}.parquet"))
            continue
        copies = []
        for c in range(COPIES):
            t = src
            for k, dom in keys.items():
                t = t.set_column(t.column_names.index(k), k,
                                 pc.add(pc.cast(t[k], pa.int64()),
                                        pa.scalar(c * strides[dom],
                                                  pa.int64())))
            copies.append(t)
        pq.write_table(pa.concat_tables(copies),
                       os.path.join(SF1_DIR, f"{name}.parquet"))
    with open(manifest, "w") as f:
        json.dump(want, f)


class PeakObjectStore(threading.Thread):
    """Sample used object-store bytes (total − available) at 5 Hz."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak = 0
        self._halt = threading.Event()

    def run(self):
        import ray

        total = ray.cluster_resources().get("object_store_memory", 0)
        while not self._halt.is_set():
            try:
                avail = ray.available_resources().get(
                    "object_store_memory", total)
            except Exception:
                return  # session gone (main raised / shut down)
            self.peak = max(self.peak, int(total - avail))
            time.sleep(0.2)

    def stop(self) -> int:
        self._halt.set()
        self.join(timeout=2)
        return self.peak


def main() -> None:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from timberjack_ray.rayctx import tune_for_cluster

    tune_for_cluster(ncpu)

    from timberjack_ray import AnalyzeConfig
    from timberjack_ray.data import synth
    from timberjack_ray.pipelines.analyze import analyze_parquet

    build_sf1_tables()
    seq_dir = f"/dev/shm/tj_bench_seq/n{SEQ_N}"
    t_gen0 = time.perf_counter()
    synth.generate_sequences(SEQ_N, seq_dir, json_frac=0.3,
                             rows_per_file=max(SEQ_N // 64, 10_000))
    gen_s = round(time.perf_counter() - t_gen0, 1)
    paths = sorted(glob.glob(os.path.join(seq_dir, "part-*.parquet")))

    queries: dict = {}
    guards: dict = {}
    sampler = PeakObjectStore()
    sampler.start()

    def timed(name: str, fn, trials: int = 2):
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        queries[name] = round(best, 3)

    out_dir = "/dev/shm/tj_sf1_routed"

    def flagship():
        shutil.rmtree(out_dir, ignore_errors=True)
        cfg = AnalyzeConfig(trend=True, stats=True, collect_lines=False)
        analyze_parquet(paths, cfg, out_dir=out_dir,
                        lookup=synth.source_lookup_dict(),
                        num_partitions=max(ncpu * 4, 64))

    trials = []
    for _ in range(int(os.environ.get("GRAFT_BENCH_TRIALS", "3"))):
        t0 = time.perf_counter()
        flagship()
        trials.append(round(time.perf_counter() - t0, 3))
    queries["flagship_routed"] = min(trials)
    queries["flagship_routed_trials"] = trials
    shutil.rmtree(out_dir, ignore_errors=True)

    if not os.environ.get("GRAFT_FLAGSHIP_ONLY"):
        import __ray_entry__ as em

        # guard probes: which mode do the guarded exchanges pick at sf1?
        from timberjack_ray.functions.graph import cooccurrence_edges

        li = em._rp(SF1_DIR, "lineitem", columns=["l_orderkey", "l_partkey"])
        edges, mode = cooccurrence_edges(li, "l_orderkey", "l_partkey",
                                         edge_driver_limit=2_000_000)
        guards["cooccurrence_edges_mode"] = mode  # sf0.1: driver (1.2M edges)
        if mode != "driver":
            guards["cooccurrence_edges_rows"] = int(edges.count())
        del edges, li

        # top-10 r4 cost trackers at sf1 volume
        timed("tpch_q5", lambda: em.q_tpch_q5_local_revenue(SF1_DIR))
        timed("lpa_communities", lambda: em.q_part_communities(SF1_DIR))
        timed("sax_motifs", lambda: em.q_value_sax_motifs(SF1_DIR))
        timed("ann_ivf", lambda: em.q_ann_ivf(SF1_DIR))
        timed("fk_audit", lambda: em.q_fk_violation_audit(SF1_DIR))
        timed("session_overlap_join",
              lambda: em.q_order_session_overlap(SF1_DIR))
        timed("basket_lift", lambda: em.q_copurchase_lift_top20(SF1_DIR))
        timed("chunk_novelty", lambda: em.q_stream_chunk_novelty(SF1_DIR))
        timed("fuzzy_ed1", lambda: em.q_fuzzy_name_pairs(SF1_DIR))
        timed("skew_join", lambda: em.q_skewed_user_revenue(SF1_DIR))
        # round-5 additions at scale
        timed("stream_windowed",
              lambda: em.q_stream_windowed_counts(SF1_DIR))
        timed("hll_distinct", lambda: em.q_approx_distinct_users(SF1_DIR))

    peak = sampler.stop()
    result = {
        "metric": f"sf1 campaign: flagship wall sec ({SEQ_N} sequences) "
                  "+ top-10 trackers over 10x-replicated tables",
        "value": queries["flagship_routed"],
        "unit": "sec",
        "queries": queries,
        "guards": guards,
        "sf": 1.0,
        "num_cpus": ncpu,
        "sequences": SEQ_N,
        "sequences_per_sec": round(SEQ_N / queries["flagship_routed"], 1),
        "gen_sec": gen_s,
        "peak_object_store_bytes": peak,
        "peak_object_store_gib": round(peak / 2**30, 2),
    }
    ray.shutdown()
    print(json.dumps(result))


def scaling() -> None:
    """eff(2→8) at the sf1 sequence volume via bench.py's flagship-only
    mode with GRAFT_SEQ_ROWS — interleaved min-per-level, same
    methodology as bench.py --scaling."""
    def run(ncpu: int, trials: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_FLAGSHIP_ONLY="1", GRAFT_SEQ_ROWS=str(SEQ_N),
                   GRAFT_BENCH_TRIALS=str(trials))
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench.py")],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    best: dict[int, dict] = {}

    def consider(r):
        c = r["num_cpus"]
        if c not in best or r["value"] < best[c]["value"]:
            best[c] = r

    for _round in range(2):
        for c in (2, 8):
            consider(run(c, trials=2 if c == 2 else 3))
    t2, t8 = best[2]["value"], best[8]["value"]
    print(json.dumps({
        "metric": "sf1 scaling efficiency 2→8 CPUs (flagship_routed, "
                  f"{SEQ_N} sequences)",
        "unit": "efficiency",
        "value": round((t2 / t8) / 4.0, 3),
        "eff_2_8": round((t2 / t8) / 4.0, 3),
        "sec_2": t2, "sec_8": t8,
        "seq_per_sec_2": best[2]["sequences_per_sec"],
        "seq_per_sec_8": best[8]["sequences_per_sec"],
        "sequences": SEQ_N,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
