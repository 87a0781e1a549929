"""Ratio-over-ratio bench comparison (VERDICT r12 item 1, r13 item 1).

Raw walls can't be compared across runs on boxes with different (or
drifting) job-latency floors; per-row nearest-sentinel RATIOS normalize
scan/compute-bound rows but NOT job-count-heavy rows (streaming drains,
iterative loops), whose wall is mostly jobs x per-job scheduling
latency. This tool reads two bench artifacts and prints, per query:

  - rr: ratio of the new run's sentinel-ratio to the old run's
  - jobs: the row's Spark job count in each run (when recorded)
  - adj_rr: the JOB-NORMALIZED ratio-of-ratios -- each side's wall has
    jobs * per_job_overhead subtracted first (per_job = that run's
    job_overhead_sec / 20, the probe being a 20-job loop), so the
    compared quantity is the compute component alone. Rows whose
    adjusted wall clamps at the floor (pure-overhead rows: the whole
    wall was scheduling latency) are marked `~` -- for those the walls
    are explained by the probes and carry no code signal.

The verdict column uses adj_rr when both runs carry job counts, else rr.

Usage:
  python tools/bench_ratio_compare.py OLD.json NEW.json [--flag 2.0]
  python tools/bench_ratio_compare.py BENCH_r12.json NEW.json
      (BENCH_rN.json driver artifacts are unwrapped via their "parsed"
       key; pre-r14 artifacts lack per-row ratios and job counts, so
       rows fall back to wall / sentinel_sec and a blank adj_rr)
"""

from __future__ import annotations

import json
import math
import sys

# below this adjusted wall (seconds) the row is treated as pure overhead:
# the subtraction consumed (nearly) the whole wall, and the remainder is
# noise, not compute
ADJ_FLOOR = 0.05
PROBE_JOBS = 20  # _job_overhead_trial runs 20 tiny jobs


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    return d.get("parsed", d)


def _row_ratios(d: dict) -> dict[str, float]:
    """Per-query normalized cost: nearest-interleaved-sentinel ratio when
    the artifact carries it, else wall / run-median sentinel."""
    out: dict[str, float] = {}
    near = d.get("ratios_to_nearest_sentinel") or {}
    sent = d.get("sentinel_sec") or 0.0
    for name, wall in (d.get("queries") or {}).items():
        if name in near:
            out[name] = float(near[name][0])
        elif sent > 0:
            out[name] = round(wall / sent, 2)
    return out


def _adj_ratios(d: dict) -> dict[str, tuple[float, bool]]:
    """Per-query job-normalized sentinel ratio: (wall - jobs * per_job)
    / sentinel, plus a flag for rows clamped at the overhead floor.
    Empty for artifacts without job counts (pre-r14)."""
    out: dict[str, tuple[float, bool]] = {}
    jobs = d.get("jobs") or {}
    sent = d.get("sentinel_sec") or 0.0
    overhead = d.get("job_overhead_sec") or 0.0
    if not jobs or sent <= 0 or overhead <= 0:
        return out
    per_job = overhead / PROBE_JOBS
    for name, wall in (d.get("queries") or {}).items():
        if name not in jobs:
            continue
        adj = wall - jobs[name] * per_job
        clamped = adj < ADJ_FLOOR
        out[name] = (round(max(adj, ADJ_FLOOR) / sent, 3), clamped)
    return out


def compare(
    old: dict, new: dict, flag: float = 2.0
) -> list[tuple]:
    """Rows present in both runs, sorted by |log(decisive ratio)| desc:
    (name, old_r, new_r, rr, jobs_old, jobs_new, adj_rr, clamped,
    verdict). Verdict is 'REGRESSED' / 'IMPROVED' past the flag
    threshold on adj_rr when both sides carry job counts, else on rr;
    clamped (pure-overhead) rows never regress -- their walls are the
    probes' story, not the code's."""
    ro, rn = _row_ratios(old), _row_ratios(new)
    ao, an = _adj_ratios(old), _adj_ratios(new)
    rows = []
    for name in sorted(set(ro) & set(rn)):
        if ro[name] <= 0 or rn[name] <= 0:
            continue
        rr = rn[name] / ro[name]
        jobs_old = (old.get("jobs") or {}).get(name)
        jobs_new = (new.get("jobs") or {}).get(name)
        adj_rr = None
        clamped = False
        if name in ao and name in an:
            clamped = ao[name][1] or an[name][1]
            adj_rr = round(an[name][0] / max(ao[name][0], 1e-9), 2)
        decisive = adj_rr if adj_rr is not None else rr
        if clamped:
            verdict = "~overhead"
        elif decisive >= flag:
            verdict = "REGRESSED"
        elif decisive <= 1 / flag:
            verdict = "IMPROVED"
        else:
            verdict = ""
        rows.append(
            (
                name,
                ro[name],
                rn[name],
                round(rr, 2),
                jobs_old,
                jobs_new,
                adj_rr,
                clamped,
                verdict,
            )
        )
    rows.sort(
        key=lambda r: -abs(
            math.log(max(r[6] if r[6] is not None else r[3], 1e-9))
        )
    )
    return rows


def main() -> None:
    argv = sys.argv[1:]
    flag = 2.0
    if "--flag" in argv:
        i = argv.index("--flag")
        flag = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = _load(args[0]), _load(args[1])
    print(
        f"probes old: sentinel {old.get('sentinel_sec')} overhead "
        f"{old.get('job_overhead_sec')} | new: sentinel "
        f"{new.get('sentinel_sec')} overhead {new.get('job_overhead_sec')}"
    )
    rows = compare(old, new, flag)
    print(
        f"{'query':44s} {'old_r':>7s} {'new_r':>7s} {'rr':>6s} "
        f"{'jobs':>11s} {'adj_rr':>7s}  verdict"
    )
    for name, a, b, rr, jo, jn, adj, clamped, verdict in rows:
        jtxt = (
            f"{jo:g}->{jn:g}" if jo is not None and jn is not None else "-"
        )
        atxt = (f"{adj:.2f}" + ("~" if clamped else "")) if adj is not None else "-"
        print(
            f"{name:44s} {a:7.2f} {b:7.2f} {rr:6.2f} {jtxt:>11s} "
            f"{atxt:>7s}  {verdict}"
        )
    n_reg = sum(1 for r in rows if r[8] == "REGRESSED")
    n_adj = sum(1 for r in rows if r[6] is not None)
    print(
        f"\n{len(rows)} shared rows ({n_adj} job-normalized); "
        f"{n_reg} regressed past {flag}x"
    )


if __name__ == "__main__":
    main()
