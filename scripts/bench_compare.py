#!/usr/bin/env python3
"""Round-over-round bench comparison: totals and per-query median ratios
over the shared query set, flagging real movers vs uniform drift."""
import json, sys, statistics

a = json.load(open(sys.argv[1]))  # older
b = json.load(open(sys.argv[2]))  # newer
qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
sa = sum(qa[q] for q in shared)
sb = sum(qb[q] for q in shared)
ratios = {q: qb[q] / qa[q] for q in shared if qa[q] > 0}
med = statistics.median(ratios.values())
print(f"shared {len(shared)}: {sa:.1f}s -> {sb:.1f}s "
      f"(total ratio {sb/sa:.3f}, median per-query ratio {med:.3f})")
movers = [(q, r) for q, r in ratios.items()
          if (r > 1.5 or r < 0.67) and max(qa[q], qb[q]) > 0.3]
for q, r in sorted(movers, key=lambda x: -x[1]):
    print(f"  {q}: {qa[q]:.2f} -> {qb[q]:.2f} ({r:.2f}x)")
new = sorted(set(qb) - set(qa))
if new:
    print(f"new ({len(new)}): " +
          ", ".join(f"{q}={qb[q]:.2f}s" for q in new))
print(f"totals: old {a['value']:.1f}s/{len(qa)}q  new {b['value']:.1f}s/{len(qb)}q")
