"""Numpy simulation of v1's zero-fill recurrence vs true banded DP."""
import numpy as np

q = np.array([2, 1, 3, 3, 0, 2, 3, 2, 2, 2, 2, 1, 0])
t = np.array([2, 3, 2, 1, 0, 0, 1, 3, 3, 1, 2, 0, 1, 1, 3, 1, 1, 0])
band, match, mismatch, gap = 4, 2, -4, -3
Lq, Lt = len(q), len(t)

NEG = -10**9
# true banded SW
H = np.zeros((Lq + 1, Lt + 1))
for i in range(1, Lq + 1):
    for j in range(1, Lt + 1):
        if abs(j - i) > band:
            H[i, j] = NEG
            continue
        sub = match if q[i-1] == t[j-1] else mismatch
        d = H[i-1, j-1] if abs((j-1)-(i-1)) <= band else NEG
        if i-1 == 0 or j-1 == 0:
            d = 0
        u = H[i-1, j] if (i-1 == 0 or abs(j-(i-1)) <= band) else NEG
        l = H[i, j-1] if (j-1 == 0 or abs((j-1)-i) <= band) else NEG
        H[i, j] = max(d + sub, u + gap, l + gap, 0)

# v1 recurrence: out-of-band cells STORED as 0, preds read stored values
G = np.zeros((Lq + 1, Lt + 1))
for i in range(1, Lq + 1):
    for j in range(1, Lt + 1):
        sub = match if q[i-1] == t[j-1] else mismatch
        v = max(max(G[i-1, j-1] + sub, 0), max(G[i-1, j], G[i, j-1]) + gap)
        G[i, j] = v if abs(j - i) <= band else 0

Hm = np.where(H < 0, 0, H)
print("true best:", Hm.max(), "v1 best:", G.max())
diff = np.argwhere((Hm != G) & (np.abs(np.subtract.outer(np.arange(Lq+1), np.arange(Lt+1))) <= band))
for i, j in diff[:10]:
    print(f"cell ({i},{j}) true {Hm[i,j]} v1 {G[i,j]}  j-i={j-i}")
