import multiprocessing as mp, sys, time
import numpy as np

def burn(n_iter):
    src = np.zeros(64 * 1024 * 1024, dtype=np.int64)  # 512 MiB
    dst = np.empty_like(src)
    t0 = time.time()
    b = 0
    for _ in range(n_iter):
        np.copyto(dst, src)
        b += src.nbytes * 2
    dt = time.time() - t0
    return (b / 1e9, dt)

if __name__ == "__main__":
    n = int(sys.argv[1]); iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    with mp.Pool(n) as p:
        t0 = time.time()
        res = p.map(burn, [iters] * n)
        wall = time.time() - t0
    tot = sum(r[0] for r in res)
    per = [r[0]/r[1] for r in res]
    print(f"n={n} aggregate={tot/wall:.1f} GB/s per-proc avg={sum(per)/len(per):.1f} min={min(per):.1f}")
