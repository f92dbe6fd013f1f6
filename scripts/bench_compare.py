#!/usr/bin/env python3
"""Round-over-round bench comparison: totals and per-query median ratios
over the shared query set, flagging real movers vs uniform drift.

Since r15 every artifact carries a drift SENTINEL (the same constant-plan,
IO-free probe timed at bench start/mid/end). When both artifacts have one,
per-query ratios are divided by the sentinel ratio (newer box speed /
older box speed) BEFORE mover flagging, so a uniformly slower box doesn't
read as a regression. Raw ratios are still printed alongside."""
import json, sys, statistics

a = json.load(open(sys.argv[1]))  # older
b = json.load(open(sys.argv[2]))  # newer
qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb))
sa = sum(qa[q] for q in shared)
sb = sum(qb[q] for q in shared)
ratios = {q: qb[q] / qa[q] for q in shared if qa[q] > 0}
med = statistics.median(ratios.values())


def sent_mean(art):
    s = art.get("sentinel")
    if not s:
        return None
    vals = [s[k] for k in ("start", "mid", "end") if k in s]
    return statistics.mean(vals) if vals else None


sm_a, sm_b = sent_mean(a), sent_mean(b)
if sm_a is not None and sm_b is not None and sm_a > 0:
    drift = sm_b / sm_a
    print(f"sentinel: old {sm_a:.3f}s new {sm_b:.3f}s -> box drift "
          f"{drift:.3f}x (per-query ratios normalized by it)")
else:
    # pre-r15 artifact: fall back to the median per-query ratio as the
    # drift proxy (assumes most queries did not really move)
    drift = med
    print(f"no sentinel in one artifact: using median ratio {med:.3f} "
          f"as the drift proxy")

# The per-query AND-rule cannot flag a UNIFORM regression: a change that
# slows all CPU-bound work also slows the sentinel, so normalized ratios
# sit near 1.0 (and with the no-sentinel fallback a uniform move is
# unflaggable by construction). Surface it as a total-vs-sentinel
# divergence warning instead of silence.
total_ratio = sb / sa if sa > 0 else float("nan")
if total_ratio == total_ratio and abs(total_ratio - drift) > 0.25:
    print(f"WARNING: total ratio {total_ratio:.3f} diverges from drift "
          f"{drift:.3f} by >0.25 — global movement the per-query mover "
          f"rule cannot attribute; inspect the totals, not just movers")

norm = {q: r / drift for q, r in ratios.items()}
print(f"shared {len(shared)}: {sa:.1f}s -> {sb:.1f}s "
      f"(total ratio {sb/sa:.3f}, median per-query ratio {med:.3f}, "
      f"median normalized {statistics.median(norm.values()):.3f})")
# conservative AND-rule: the sentinel is a pure-CPU probe, so dividing by
# its full ratio over-corrects queries dominated by fixed scheduler/IO
# latency (which doesn't speed up with the box). A real mover must cross
# the threshold in BOTH the raw and the normalized view.
movers = [(q, norm[q]) for q in norm
          if ((norm[q] > 1.5 and ratios[q] > 1.5) or
              (norm[q] < 0.67 and ratios[q] < 0.67)) and max(qa[q], qb[q]) > 0.3]
for q, r in sorted(movers, key=lambda x: -x[1]):
    print(f"  {q}: {qa[q]:.2f} -> {qb[q]:.2f} "
          f"(raw {ratios[q]:.2f}x, normalized {r:.2f}x)")
new = sorted(set(qb) - set(qa))
if new:
    print(f"new ({len(new)}): " +
          ", ".join(f"{q}={qb[q]:.2f}s" for q in new))
print(f"totals: old {a['value']:.1f}s/{len(qa)}q  new {b['value']:.1f}s/{len(qb)}q")
