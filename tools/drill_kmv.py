"""KMV saturated-regime accuracy drill (evidence for SCALE/COVERAGE):

1M distinct values through partitioned k=4096 sketches merged in a
random order: cardinality and set-op estimates must sit inside the
~1/sqrt(k-1) envelope, and merge bytes must be order-independent.
Run: python tools/drill_kmv.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from qsketch.kmv import KMVSketch

K = 4096
N = 1_000_000
rng = np.random.default_rng(7)

parts = np.array_split(rng.permutation(np.arange(N, dtype=np.int64)), 64)
sks = []
for p in parts:
    s = KMVSketch(k=K)
    s.update(p)
    sks.append(s)
order = rng.permutation(64)
m1 = sks[order[0]]
for i in order[1:]:
    m1 = m1.merge(sks[i])
m2 = sks[0]
for s in sks[1:]:
    m2 = m2.merge(s)
assert m1.to_bytes() == m2.to_bytes(), "merge-order bytes differ!"
err = abs(m1.estimate() - N) / N
print(f"cardinality: est={m1.estimate():.0f} true={N} rel_err={err:.4f} "
      f"(1/sqrt(k-1)={1/np.sqrt(K-1):.4f})")
assert err < 4 / np.sqrt(K - 1)

a, b = KMVSketch(k=K), KMVSketch(k=K)
a.update(np.arange(0, 600_000, dtype=np.int64))
b.update(np.arange(400_000, 1_000_000, dtype=np.int64))
inter = a.intersection_estimate(b)
jac = a.jaccard_estimate(b)
print(f"intersection: est={inter:.0f} true=200000 rel_err={abs(inter-200_000)/200_000:.4f}")
print(f"jaccard: est={jac:.4f} true=0.2 abs_err={abs(jac-0.2):.4f}")
assert abs(inter - 200_000) / 200_000 < 0.15
assert abs(jac - 0.2) < 0.03
print("PASS")
