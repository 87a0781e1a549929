"""Re-time a NAMED subset of SCALING.md rows and patch the table in place.

The full tools/scaling_probe.py sweep re-times every row at 4 scale
factors (~an hour with sf1); when a round changes a handful of operators,
this tool re-measures exactly those rows with the same methodology
(min of 2 trials, 1 past 5 s at sf1, noop sink, cache release between
trials, JIT pre-warm) and rewrites only their table lines -- the rest of
the file, including the prose, is left untouched (amend prose by hand,
as the round notes always were).

Usage: python tools/scaling_patch.py query1 query2 ...
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from aws_glue_etl_sample_hist_spark.queries import QUERIES  # noqa: E402
from aws_glue_etl_sample_hist_spark.session import get_spark  # noqa: E402
from tools.scaling_probe import (  # noqa: E402
    PIPELINES,
    ROOT,
    SF1_DIR,
    N_TRIALS,
    _time_pipeline,
    _time_query,
)


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        raise SystemExit("usage: scaling_patch.py query1 [query2 ...]")
    for n in names:
        if n not in QUERIES and n not in PIPELINES:
            raise SystemExit(f"unknown query: {n}")

    sfs = [
        ("sf0.001", os.path.join(ROOT, "sf0.001")),
        ("sf0.01", os.path.join(ROOT, "sf0.01")),
        ("sf0.1", os.path.join(ROOT, "sf0.1")),
    ]
    if os.path.isdir(SF1_DIR):
        sfs.append(("sf1", SF1_DIR))
    labels = [s for s, _ in sfs]

    spark = get_spark("scaling-patch")
    for warm in ("dedup_minhash_lsh", "pricing_summary"):
        QUERIES[warm](spark, os.path.join(ROOT, "sf0.1")).write.format(
            "noop"
        ).mode("overwrite").save()

    # probe gate (round 13): the first r13 sf1 stamps were taken on a
    # window whose job-overhead probe read 4.2 s vs the ~1-1.5 s settled
    # band and had to be discarded wholesale (medallion sf1 read 110 s vs
    # the settled 36.8). Same discipline as bench.py's closing-artifact
    # gate: measure both probes after warmup, refuse to patch SCALING.md
    # from a visibly degraded box. --force overrides (and says so).
    import statistics

    from bench import _job_overhead_trial, _sentinel_trial, gate_reference, probe_gate

    sf01 = os.path.join(ROOT, "sf0.1")
    for _ in range(2):
        _sentinel_trial(spark, sf01)
    s_med = statistics.median(_sentinel_trial(spark, sf01) for _ in range(3))
    o_med = statistics.median(_job_overhead_trial(spark) for _ in range(3))
    ok, checks = probe_gate(s_med, o_med, gate_reference())
    print(f"probes: sentinel {s_med:.3f} overhead {o_med:.3f} gate_ok {ok}")
    if not ok and "--force" not in sys.argv:
        raise SystemExit(
            f"PROBE GATE: box not settled -- {checks}; re-run when idle, "
            "re-base via SPARK_GRAFT_GATE_SENTINEL/_OVERHEAD, or --force"
        )

    walls: dict[str, dict[str, float]] = {}
    for sf, sf_dir in sfs:
        for name in names:
            if name in PIPELINES:
                walls.setdefault(name, {})[sf] = _time_pipeline(
                    spark, name, sf_dir
                )
            else:
                walls.setdefault(name, {})[sf] = _time_query(
                    spark, name, sf_dir, N_TRIALS
                )
            print(f"{sf} {name}: {walls[name][sf]:.3f}s", flush=True)

    # closing probe gate (ADVICE r13): the box's job-overhead probe
    # oscillates 1->4 s on a ~15-minute period, and an sf1 sweep runs
    # long enough to straddle a window that degrades AFTER the opening
    # gate passed. Mirror bench.py's before-and-after discipline: re-run
    # both probes and refuse to patch SCALING.md from a sweep whose
    # closing state is degraded (the measured walls stay on stdout above
    # for recovery; --force overrides and says so).
    s_med = statistics.median(_sentinel_trial(spark, sf01) for _ in range(3))
    o_med = statistics.median(_job_overhead_trial(spark) for _ in range(3))
    ok, checks = probe_gate(s_med, o_med, gate_reference())
    print(
        f"closing probes: sentinel {s_med:.3f} overhead {o_med:.3f} "
        f"gate_ok {ok}"
    )
    if not ok and "--force" not in sys.argv:
        raise SystemExit(
            f"CLOSING PROBE GATE: box degraded during the sweep -- "
            f"{checks}; SCALING.md NOT patched (walls printed above). "
            "Re-run when idle, or --force"
        )

    path = os.path.join(os.path.dirname(__file__), "..", "SCALING.md")
    with open(path) as f:
        text = f.read()

    def row_line(name: str) -> str:
        w = walls[name]
        cells = [f"{w[s]:.2f}" for s in labels]
        ratios = [
            f"{w[labels[i + 1]] / max(w[labels[i]], 1e-9):.1f}"
            for i in range(len(labels) - 1)
        ]
        return f"| {name} | " + " | ".join(cells + ratios) + " |"

    appended = []
    for name in names:
        pat = re.compile(rf"^\| {re.escape(name)} \|.*$", re.M)
        if pat.search(text):
            text = pat.sub(row_line(name), text, count=1)
        else:
            appended.append(row_line(name))
    if appended:
        # insert new rows just before the blank line that ends the table
        m = re.search(r"(\n\| [^\n]+ \|)\n\n", text)
        assert m, "could not find end of SCALING table"
        text = (
            text[: m.end(1)] + "\n" + "\n".join(appended) + text[m.end(1):]
        )
    with open(path, "w") as f:
        f.write(text)
    print(f"patched {os.path.abspath(path)}: {', '.join(names)}")


if __name__ == "__main__":
    main()
