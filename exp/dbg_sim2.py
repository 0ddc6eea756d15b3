"""Literal numpy port of _kernel_v1's wavefront loop for one pair."""
import numpy as np

q = np.array([2, 1, 3, 3, 0, 2, 3, 2, 2, 2, 2, 1, 0, 1, 3, 2])  # padded to 16
t18 = np.array([2, 3, 2, 1, 0, 0, 1, 3, 3, 1, 2, 0, 1, 1, 3, 1, 1, 0])
t = np.concatenate([t18, np.array([1, 2, 3, 0, 1, 2])])          # padded to 24
ql, tl = 13, 18
band, match, mismatch, gap = 4, 2, -4, -3
Lq, Lt = 16, 24

i = np.arange(1, Lq + 1)
dlo = i + np.maximum(1, i - band)
dhi = np.where(i <= ql, i + np.minimum(tl, i + band), -1)

ad1 = np.zeros(Lq, np.int64)
s2 = np.zeros(Lq, np.int64)
best_v = np.zeros(Lq, np.int64)
best_d = np.zeros(Lq, np.int64)

for d in range(2, Lq + Lt + 1):
    # ts[p] = t[d-2-p] (or garbage when out of range; mask covers validity)
    idx = d - 2 - np.arange(Lq)
    ts = np.where((idx >= 0) & (idx < Lt), t[np.clip(idx, 0, Lt - 1)], -1)
    sub = np.where(q == ts, match, mismatch)
    s1 = np.concatenate([[0], ad1[:-1]])
    td = np.maximum(s2 + sub, 0)
    mg = np.maximum(ad1, s1) + gap
    v = np.maximum(td, mg)
    v = np.where((d >= dlo) & (d <= dhi), v, 0)
    gt = v > best_v
    best_d = np.where(gt, d, best_d)
    best_v = np.maximum(best_v, v)
    s2 = s1
    ad1 = v

print("best:", best_v.max(), "at slot", best_v.argmax(), "d",
      best_d[best_v.argmax()])
