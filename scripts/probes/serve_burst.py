"""Live serving burst benchmark against scripts/serve.py on the real chip.

Fires R rounds of C-way concurrent JPEG POSTs (a burst), plus a sequential
pass, and reports client-side p50/p95/p99 per mode + server /healthz stats.
"""
import argparse, io, json, sys, threading, time, urllib.request
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--port", type=int, default=8077)
ap.add_argument("--concurrency", type=int, default=16)
ap.add_argument("--rounds", type=int, default=8)
ap.add_argument("--sequential", type=int, default=32)
ap.add_argument("--poisson-rps", type=float, default=0.0,
                help="also run an open-loop Poisson arrival pass at this rate "
                     "(requests/s) — the traffic pattern where iteration-level "
                     "admission (scheduler=continuous) matters")
ap.add_argument("--poisson-seconds", type=float, default=20.0)
a = ap.parse_args()
base = f"http://127.0.0.1:{a.port}"

rng = np.random.default_rng(0)
from PIL import Image
imgs = []
for i in range(a.concurrency):
    arr = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    buf = io.BytesIO(); Image.fromarray(arr).save(buf, format="JPEG")
    imgs.append(buf.getvalue())

errors = []


def post(body):
    # One retry on transient socket resets (ThreadingHTTPServer under a
    # 16-way connect storm occasionally drops an accept); the retry is
    # re-timed from its own start so a dropped connection never pollutes
    # the latency sample it replaces.
    for attempt in (0, 1):
        req = urllib.request.Request(base + "/caption", data=body,
                                     headers={"Content-Type": "image/jpeg"})
        t0 = time.perf_counter()
        try:
            r = json.loads(urllib.request.urlopen(req, timeout=120).read())
            return (time.perf_counter() - t0) * 1000.0, r
        except (ConnectionError, OSError) as e:  # noqa: PERF203
            errors.append(repr(e))
            if attempt:
                raise

# warm each bucket via a few bursts first (compile already done by --prejit/warmup)
for _ in range(2):
    ts = [threading.Thread(target=post, args=(imgs[i],)) for i in range(a.concurrency)]
    [t.start() for t in ts]; [t.join() for t in ts]

# sequential pass
seq = [post(imgs[i % len(imgs)])[0] for i in range(a.sequential)]

# burst rounds
burst, rounds = [], []
for r in range(a.rounds):
    out = [None] * a.concurrency
    def worker(i):
        res = post(imgs[i])
        out[i] = res[0] if res else None
    ts = [threading.Thread(target=worker, args=(i,)) for i in range(a.concurrency)]
    [t.start() for t in ts]; [t.join() for t in ts]
    got = [x for x in out if x is not None]
    rounds.append({"min": round(min(got), 1), "max": round(max(got), 1)})
    burst.extend(got)
    time.sleep(0.3)

def pct(xs):
    xs = np.asarray(xs)
    return {k: round(float(np.percentile(xs, q)), 1)
            for k, q in (("p50", 50), ("p95", 95), ("p99", 99))} | {
            "mean": round(float(xs.mean()), 1), "n": len(xs)}

# open-loop Poisson pass: requests fired at exponential inter-arrival times,
# never waiting for earlier responses (open loop = arrival rate independent of
# service latency, the honest way to measure tail latency under load)
poisson = []
if a.poisson_rps > 0:
    prng = np.random.default_rng(1)
    stop_at = time.perf_counter() + a.poisson_seconds
    threads = []
    i = 0
    while time.perf_counter() < stop_at:
        t = threading.Thread(target=lambda j=i: poisson.append(post(imgs[j % len(imgs)])[0]))
        t.start()
        threads.append(t)
        i += 1
        time.sleep(float(prng.exponential(1.0 / a.poisson_rps)))
    for t in threads:
        t.join()

health = json.loads(urllib.request.urlopen(base + "/healthz", timeout=30).read())
burst = [b for b in burst if b is not None]
out = {"sequential_ms": pct(seq),
       f"burst{a.concurrency}_ms": pct(burst),
       "burst_rounds_minmax_ms": rounds,
       "retried_connection_errors": len(errors),
       "server_healthz": health}
if poisson:
    out[f"poisson{a.poisson_rps:g}rps_ms"] = pct([p for p in poisson if p is not None])
print(json.dumps(out, indent=1))
