#!/usr/bin/env python3
"""Round-over-round bench regression check over bench_history.jsonl.

Each line is the graft.Bench JSON output plus a "tag" field (written when
Bench runs with SPARK_GRAFT_BENCH_HISTORY / SPARK_GRAFT_BENCH_TAG set).
Compares the last two entries (or two named tags) per query and flags
regressions, so a bench diff is a committed file instead of a judge
re-run. Tooling only — NOT part of the Scala library.

Usage: python3 tools/bench_diff.py [history.jsonl] [old_tag new_tag]
Exit 1 iff any query regressed more than THRESHOLD x beyond the noise
floor, or dropped out of the benched surface.
"""
import json
import sys

THRESHOLD = 1.5   # flag > 1.5x slower ...
MIN_DELTA = 0.3   # ... AND > 0.3s absolute — sub-second queries jitter
                  # 1.5-2x run to run on a busy machine; a real plan
                  # regression moves both the ratio and the absolute time
FLOOR = 0.15      # seconds; below this, timing is JVM noise

path = sys.argv[1] if len(sys.argv) > 1 else "bench_history.jsonl"
rows = [json.loads(l) for l in open(path) if l.strip()]
if len(rows) < 2 and len(sys.argv) < 4:
    print(f"need >= 2 history rows in {path}, have {len(rows)}")
    sys.exit(0)

if len(sys.argv) >= 4:
    by_tag = {r.get("tag", "untagged"): r for r in rows}
    old, new = by_tag[sys.argv[2]], by_tag[sys.argv[3]]
else:
    old, new = rows[-2], rows[-1]

oq, nq = old["queries"], new["queries"]
print(f"comparing {old.get('tag', '?')} (total {old['value']:.1f}s, "
      f"{len(oq)} queries) -> {new.get('tag', '?')} "
      f"(total {new['value']:.1f}s, {len(nq)} queries)")

regressions, missing = [], []
for name, t_old in sorted(oq.items()):
    if name not in nq:
        missing.append(name)
        continue
    t_new = nq[name]
    if (t_new > FLOOR and t_old > 0 and t_new / t_old > THRESHOLD
            and t_new - t_old > MIN_DELTA):
        regressions.append((name, t_old, t_new))

added = sorted(set(nq) - set(oq))
if added:
    print(f"new queries ({len(added)}): {' '.join(added)}")
for name, t_old, t_new in sorted(regressions, key=lambda r: -r[2] / r[1]):
    print(f"REGRESSION {name}: {t_old:.2f}s -> {t_new:.2f}s "
          f"({t_new / t_old:.1f}x)")
for name in missing:
    print(f"MISSING {name}: benched in {old.get('tag', '?')} but not in "
          f"{new.get('tag', '?')}")
if not regressions and not missing:
    print("OK: no per-query regression beyond "
          f"{THRESHOLD}x (noise floor {FLOOR}s)")
sys.exit(1 if (regressions or missing) else 0)
