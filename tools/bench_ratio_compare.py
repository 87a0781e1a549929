"""Ratio-over-ratio bench comparison (VERDICT r12 item 1).

Raw walls can't be compared across runs on boxes with different (or
drifting) job-latency floors; per-row nearest-sentinel RATIOS can. This
tool reads two bench artifacts (bench_result.json format — must carry
`ratios_to_nearest_sentinel`) and prints, per query, the ratio of the
new run's sentinel-ratio to the old run's, flagging rows whose
normalized cost moved more than the threshold in either direction.

Usage:
  python tools/bench_ratio_compare.py OLD.json NEW.json [--flag 2.0]
  python tools/bench_ratio_compare.py BENCH_r12.json NEW.json
      (BENCH_rN.json driver artifacts are unwrapped via their "parsed"
       key; those lack per-row ratios, so rows fall back to
       wall / sentinel_sec — the endpoint-median normalization)
"""

from __future__ import annotations

import json
import sys


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


def compare(
    old: dict, new: dict, flag: float = 2.0
) -> list[tuple[str, float, float, float, str]]:
    """Rows present in both runs, sorted by |log(ratio-of-ratios)| desc:
    (name, old_ratio, new_ratio, ratio_of_ratios, verdict). Verdict is
    'REGRESSED' / 'IMPROVED' past the flag threshold, else ''."""
    ro, rn = _row_ratios(old), _row_ratios(new)
    rows = []
    for name in sorted(set(ro) & set(rn)):
        if ro[name] <= 0 or rn[name] <= 0:
            continue
        rr = rn[name] / ro[name]
        verdict = (
            "REGRESSED" if rr >= flag else "IMPROVED" if rr <= 1 / flag else ""
        )
        rows.append((name, ro[name], rn[name], round(rr, 2), verdict))
    rows.sort(key=lambda r: -abs(__import__("math").log(max(r[3], 1e-9))))
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
    print(f"{'query':44s} {'old_r':>7s} {'new_r':>7s} {'rr':>6s}  verdict")
    for name, a, b, rr, verdict in rows:
        print(f"{name:44s} {a:7.2f} {b:7.2f} {rr:6.2f}  {verdict}")
    n_reg = sum(1 for r in rows if r[4] == "REGRESSED")
    print(f"\n{len(rows)} shared rows; {n_reg} regressed past {flag}x")


if __name__ == "__main__":
    main()
