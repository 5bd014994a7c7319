#!/usr/bin/env python3
"""Per-query bench regression check: compare a fresh Bench line (file or
stdin) against the committed idle reference table BENCH_IDLE_r12.json.

Usage: sbt "runMain graft.Bench" | grep '"metric"' > /tmp/b.json
       python3 tools/regress.py /tmp/b.json [BENCH_IDLE_r12.json]

Flags queries slower than the reference by >30% AND >0.3s (both — small
queries jitter in relative terms, big ones in absolute). Driver-run
BENCH_rN.json numbers are contention-inflated (r9-r11 verdicts); only
compare idle runs against this table.
"""
import json, sys

def load(path):
    line = open(path).read()
    return json.loads(line[line.index('{'):])

new = load(sys.argv[1])
ref = load(sys.argv[2] if len(sys.argv) > 2 else 'BENCH_IDLE_r12.json')
on, nn = ref['queries'], new['queries']
if new.get('n_errors'):
    print(f"ERRORS: {new['errors']}"); sys.exit(1)
# the detail dict lists only the slowest queries (q_omitted carries the
# rest), so membership shifts run-to-run near the cutoff: compare shared
# keys only, and treat one-sided keys as cutoff artifacts, not changes
reg = [(k, on[k], nn[k]) for k in on
       if k in nn and nn[k] > on[k] * 1.3 and nn[k] - on[k] > 0.3]
print(f"ref {ref['value']}s/{ref['n_queries']}q  new {new['value']}s/{new['n_queries']}q")
for k, o, n in sorted(reg, key=lambda t: t[2] - t[1], reverse=True):
    print(f"  REGRESSION {k}: {o:.2f}s -> {n:.2f}s")
if new['value'] > ref['value'] * 1.2:
    print("  TOTAL regressed >20%"); reg.append(('total', ref['value'], new['value']))
sys.exit(1 if reg else 0)
