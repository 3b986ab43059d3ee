#!/usr/bin/env python
"""Batched caption-serving CLI.

Minimal production-style serving loop for the latency_ms_p95 target
(reference configs/default.yaml:92): an HTTP endpoint that queues incoming
images, forms padded batches (fixed batch buckets so XLA compiles once per
bucket), decodes them in one jitted generate call, and reports rolling
latency percentiles.

    python scripts/serve.py --config configs/default.yaml --port 8077 \
        [--model-path checkpoints/best_model_stage2] [--platform cpu]

POST /caption   body: raw image bytes (JPEG/PNG) or JSON
                {"image": [[...]]} float array -> {"caption": ...,
                "latency_ms": ...}
GET  /healthz   -> {"status": "ok", "p50_ms": ..., "p95_ms": ..., "served": N}

Implementation notes (TPU-first):
* one decode graph per batch bucket (powers of two up to --max-batch);
  requests are padded up to the bucket so shapes stay static;
* batching window (--batch-wait-ms) trades p50 for throughput under load;
* the model runs with bf16 inference params (weight-bandwidth-bound decode).
"""

import argparse
import json
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def _load_serving_model(config, model_path=None):
    """(image_processor, model) with uint8 wire format and optional checkpoint."""
    from pgica_tpu.utils.factories import create_model, create_processors, create_tokenizer

    tokenizer = create_tokenizer(config)
    image_processor, _ = create_processors(config, tokenizer)
    # Serving wire format is uint8: hosts decode+resize only, the model
    # normalizes on device (augment.prepare_images) — 4x less
    # host->device transfer per request (measured +25% captions/s).
    image_processor.device_side_normalization = True
    model = create_model(config, tokenizer)
    if model_path:
        import jax
        import jax.numpy as jnp

        from pgica_tpu.training.checkpoint import CheckpointManager, effective_params

        payload = CheckpointManager(Path(model_path).parent).restore(model_path)
        model.params = jax.tree.map(jnp.asarray, effective_params(payload))
    return image_processor, model


class CaptionService:
    """Owns the model and the batching loop."""

    def __init__(self, config, model_path=None, max_batch: int = 32, batch_wait_ms: float = 5.0,
                 max_length: int = 32, workers: int = 2, batch_wait_max_ms: float = 75.0,
                 early_stop: bool = True):
        self.image_processor, self.model = _load_serving_model(config, model_path)
        self.max_batch = int(max_batch)
        self.batch_wait_s = float(batch_wait_ms) / 1000.0
        self.batch_wait_max_s = max(float(batch_wait_max_ms) / 1000.0, self.batch_wait_s)
        self.max_length = int(max_length)
        # Early-exit decode: the while_loop decode stops once every caption in
        # the bucket hit EOS — token-identical to the fixed scan, and real
        # captions (~10-25 tokens) finish far below max_length, so the served
        # latency tracks actual caption length instead of the static bound.
        self.early_stop = bool(early_stop)
        self.buckets = [b for b in (1, 2, 4, 8, 16, 32, 64) if b <= self.max_batch]
        self._queue: "queue.Queue" = queue.Queue()
        self._latencies = []
        self._served = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        # One decode occupies the chip at a time; a worker that dispatched
        # while another decode is in flight would only fragment a burst into
        # serialized narrow decodes (measured: 16-way burst p95 1.2 s vs
        # ~0.3 s coalesced). Workers hold this lock across generate_captions
        # and keep DRAINING the queue while waiting for it, so everything
        # that arrives during decode A rides ONE decode B.
        self._device = threading.Lock()
        # Requests that the HTTP layer has ACCEPTED but not yet enqueued
        # (payload still being read/JPEG-decoded by a handler thread). A
        # 16-way burst is visible here tens of ms before the images reach
        # the queue on a busy host; the batching window stays open while
        # this is non-zero (bounded by batch_wait_max_ms) so the burst
        # rides ONE wide decode instead of a premature narrow one + a wide
        # one. A stalled client can hold the window open for at most the
        # hard cap per batch.
        self._arriving = 0
        # >1 batching workers pipeline bursts: worker B forms its batch (and
        # absorbs the queue) while worker A's decode is still on device.
        self._workers = [
            threading.Thread(target=self._loop, daemon=True)
            for _ in range(max(1, int(workers)))
        ]

    # -- lifecycle ---------------------------------------------------------------

    def warmup(self, start_worker: bool = True) -> list:
        """Pre-compile every batch bucket (cold-start latency off the request path).

        Returns per-bucket (batch, seconds) timings. With the persistent XLA
        compilation cache enabled (all CLIs do), the compiled executables are
        reusable by later server processes — see ``--prejit``.
        """
        size = self.model.image_size
        timings = []
        for b in self.buckets:
            t0 = time.perf_counter()
            self.model.generate_captions(
                np.zeros((b, size, size, 3), np.uint8), max_length=self.max_length,
                early_stop=self.early_stop,
            )
            timings.append((b, time.perf_counter() - t0))
        if start_worker:
            for w in self._workers:
                w.start()
        return timings

    def shutdown(self):
        self._stop.set()

    # -- request path -------------------------------------------------------------

    def begin_arrival(self):
        """Signal an accepted request whose payload is still being parsed.

        Call before the (possibly slow) body read + image decode; pass
        ``arrived=True`` to the matching :meth:`submit` so the counter drops
        the moment the request is enqueued. On a parse failure, call
        :meth:`abort_arrival` instead.
        """
        with self._lock:
            self._arriving += 1

    def abort_arrival(self):
        with self._lock:
            self._arriving = max(0, self._arriving - 1)

    def submit(self, image: np.ndarray, timeout: float = 30.0, arrived: bool = False) -> dict:
        """Blocking single-request API used by the HTTP handler threads."""
        try:
            image = np.asarray(image)
            if image.dtype != np.uint8:
                # The batch buffer is uint8 (wire format); a silent cast would
                # turn [0,1]-normalized floats into all-zero images. Accept
                # [0,255]-ranged floats, reject normalized ones loudly. An
                # all-zero image is black under either convention — allow it.
                if np.issubdtype(image.dtype, np.floating) and image.size and 0.0 < image.max() <= 1.0:
                    raise ValueError(
                        "submit() expects uint8 images in [0, 255] (got normalized "
                        f"float with max {float(image.max()):.3f}); multiply by 255 first"
                    )
                image = np.clip(image, 0, 255).astype(np.uint8)
            done = threading.Event()
            slot = {"image": image, "event": done, "caption": None, "t0": time.perf_counter()}
            self._queue.put(slot)
        finally:
            if arrived:
                self.abort_arrival()  # enqueued (or rejected): not "arriving"
        if not done.wait(timeout):
            raise TimeoutError("caption request timed out")
        latency_ms = 1000.0 * (time.perf_counter() - slot["t0"])
        with self._lock:
            self._latencies.append(latency_ms)
            self._latencies = self._latencies[-1000:]  # rolling window
            self._served += 1
        return {"caption": slot["caption"], "latency_ms": round(latency_ms, 2)}

    def stats(self) -> dict:
        with self._lock:
            lat = list(self._latencies)
            served = self._served
            arriving = self._arriving
        out = {"status": "ok", "served": served, "arriving": arriving}
        if lat:
            out["p50_ms"] = round(float(np.percentile(lat, 50)), 2)
            out["p95_ms"] = round(float(np.percentile(lat, 95)), 2)
        return out

    # -- batching loop -------------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.batch_wait_s
            hard_deadline = time.perf_counter() + self.batch_wait_max_s
            # Cap at the largest COMPILED bucket, not max_batch: with e.g.
            # --max-batch 12 the buckets are [1,2,4,8] and gathering 12
            # requests would overflow the 8-wide bucket array.
            while len(batch) < self.buckets[-1]:
                now = time.perf_counter()
                if now >= hard_deadline:
                    break
                if now >= deadline and self._arriving <= 0:
                    break
                # Adaptive window: every arrival extends the deadline by one
                # base window (Nagle-style), and the window also stays open
                # while the HTTP layer holds ACCEPTED requests whose payloads
                # are still being parsed (begin_arrival) — both bounded by
                # the hard cap. A lone request still dispatches after
                # batch_wait_ms; a burst whose requests trickle in through
                # handler threads (16 JPEG decodes contend for host cores)
                # coalesces into ONE wide decode instead of a premature
                # narrow one + a wide one (each decode occupies the chip for
                # a full generate, so fragmenting a burst multiplies tail
                # latency — measured 2x p95 on a 16-way burst).
                wait = min(max(deadline - now, 0.002), hard_deadline - now)
                try:
                    batch.append(self._queue.get(timeout=wait))
                    deadline = time.perf_counter() + self.batch_wait_s
                except queue.Empty:
                    pass
            # Wait for the chip, absorbing the queue the whole time: anything
            # that arrives while another worker's decode is in flight joins
            # THIS batch instead of spawning a third serialized decode. The
            # tail under a burst is then bounded by window + 2 decodes.
            while not self._device.acquire(timeout=0.002):
                while len(batch) < self.buckets[-1]:
                    try:
                        batch.append(self._queue.get_nowait())
                    except queue.Empty:
                        break
            try:
                # Final queue-depth-aware drain: a burst that lands right as
                # the wait window closes is already queued — take it now (no
                # extra wait) and ride a larger compiled bucket.
                while len(batch) < self.buckets[-1]:
                    try:
                        batch.append(self._queue.get_nowait())
                    except queue.Empty:
                        break
                bucket = self._bucket(len(batch))
                try:  # keep the server alive; any failure fails only this batch
                    size = self.model.image_size
                    images = np.zeros((bucket, size, size, 3), np.uint8)
                    for i, slot in enumerate(batch):
                        images[i] = slot["image"]
                    captions = self.model.generate_captions(
                        images, max_length=self.max_length, early_stop=self.early_stop)
                except Exception as e:
                    captions = [f"<error: {type(e).__name__}>"] * bucket
            finally:
                self._device.release()
            for i, slot in enumerate(batch):
                slot["caption"] = captions[i]
                slot["event"].set()


class ContinuousCaptionService:
    """Iteration-level continuous batching (``--scheduler continuous``).

    Requests join the decode between chunks of steps instead of between whole
    decodes: a request that arrives while captions are in flight waits at most
    one chunk (~chunk x 2.7 ms/step on the profiled chip) plus its own decode,
    instead of the remainder of a full max_length decode. Engine details:
    pgica_tpu/generation/engine.py. Public surface matches CaptionService.
    """

    def __init__(self, config, model_path=None, slots: int = 16, chunk: int = 8,
                 max_length: int = 32, **_ignored):
        from pgica_tpu.generation.engine import ContinuousDecodeEngine

        self.image_processor, self.model = _load_serving_model(config, model_path)
        self.engine = ContinuousDecodeEngine(
            self.model, slots=slots, chunk=chunk, max_length=max_length,
        )
        self.buckets = self.engine.buckets
        self._latencies = []
        self._served = 0
        self._arriving = 0
        self._lock = threading.Lock()

    def warmup(self, start_worker: bool = True) -> list:
        timings = self.engine.warmup()
        if start_worker:
            self.engine.start()
        return timings

    def shutdown(self):
        self.engine.stop()

    def begin_arrival(self):
        with self._lock:
            self._arriving += 1

    def abort_arrival(self):
        with self._lock:
            self._arriving = max(0, self._arriving - 1)

    def submit(self, image: np.ndarray, timeout: float = 30.0, arrived: bool = False) -> dict:
        try:
            image = np.asarray(image)
            if image.dtype != np.uint8:
                if np.issubdtype(image.dtype, np.floating) and image.size and 0.0 < image.max() <= 1.0:
                    raise ValueError(
                        "submit() expects uint8 images in [0, 255] (got normalized "
                        f"float with max {float(image.max()):.3f}); multiply by 255 first"
                    )
                image = np.clip(image, 0, 255).astype(np.uint8)
        finally:
            if arrived:
                self.abort_arrival()
        out = self.engine.submit(image, timeout=timeout)
        with self._lock:
            self._latencies.append(out["latency_ms"])
            self._latencies = self._latencies[-1000:]
            self._served += 1
        return out

    def stats(self) -> dict:
        with self._lock:
            lat = list(self._latencies)
            served = self._served
            arriving = self._arriving
        out = {"status": "ok", "served": served, "arriving": arriving,
               "scheduler": "continuous"}
        if lat:
            out["p50_ms"] = round(float(np.percentile(lat, 50)), 2)
            out["p95_ms"] = round(float(np.percentile(lat, 95)), 2)
        out.update(self.engine.stats())
        return out


def make_handler(service: CaptionService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, service.stats())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/caption":
                self._send(404, {"error": "unknown path"})
                return
            # Announce the request BEFORE the body read + image decode: on a
            # busy host a burst's payload parsing trickles over tens of ms,
            # and the batching window stays open for announced arrivals so
            # the whole burst rides one decode.
            service.begin_arrival()
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    arr = np.asarray(json.loads(raw)["image"], np.float32)
                    image = service.image_processor.process_image(arr.astype(np.uint8))
                else:
                    # Raw bytes go straight to process_image: JPEGs take the
                    # native libjpeg decode+resize (one GIL-dropping C call,
                    # data.native_decode: fast); anything else falls back to
                    # PIL inside the processor.
                    image = service.image_processor.process_image(raw)
            except Exception as e:
                service.abort_arrival()
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                self._send(200, service.submit(image, arrived=True))
            except Exception as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/default.yaml")
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--port", type=int, default=8077)
    ap.add_argument(
        "--max-batch", type=int, default=32,
        help="largest compiled decode bucket; bursts up to this size ride ONE "
             "decode instead of queueing behind a smaller bucket",
    )
    ap.add_argument("--batch-wait-ms", type=float, default=5.0)
    ap.add_argument(
        "--batch-wait-max-ms", type=float, default=75.0,
        help="hard cap on the adaptive batching window: each arrival (and "
             "each accepted-but-still-parsing request) extends the window "
             "by --batch-wait-ms so a burst coalesces into one wide decode, "
             "but never past this cap",
    )
    ap.add_argument("--max-length", type=int, default=32)
    ap.add_argument(
        "--scheduler", default="batch", choices=["batch", "continuous"],
        help="'batch': coalesce requests into whole decodes (admission only "
             "between decodes); 'continuous': iteration-level continuous "
             "batching over a fixed slot pool — requests join between decode "
             "STEP chunks (generation/engine.py), so a straggler waits one "
             "chunk instead of a full in-flight decode",
    )
    ap.add_argument(
        "--slots", type=int, default=16,
        help="continuous scheduler: decode slot-pool width (one compiled graph)",
    )
    ap.add_argument(
        "--chunk", type=int, default=8,
        help="continuous scheduler: decode steps per jitted chunk (admission "
             "granularity)",
    )
    ap.add_argument(
        "--workers", type=int, default=2,
        help="batching loop threads; 2 pipelines host prep of batch B under "
             "batch A's device decode",
    )
    ap.add_argument("--platform", default=None, help="force a jax backend, e.g. cpu")
    ap.add_argument(
        "--quant", default=None, choices=["int8", "int8_weight_only"],
        help="decode-time int8 quantization of the decoder LM (ops/quant.py): "
             "halves decode weight HBM traffic; 'int8' also runs the matmuls "
             "int8 x int8 on the MXU",
    )
    ap.add_argument(
        "--no-early-stop", action="store_true",
        help="keep the fixed-length decode scan instead of the EOS early-exit "
             "while_loop (deterministic per-bucket latency, e.g. for probes)",
    )
    ap.add_argument(
        "--prejit", action="store_true",
        help="compile every decode bucket into the persistent XLA cache, "
             "print timings, and exit (run once before cold serving starts)",
    )
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from pgica_tpu.utils.config import Config
    from pgica_tpu.utils.factories import enable_compilation_cache, setup_logging

    setup_logging(level="INFO", filename="serving.log")
    enable_compilation_cache()
    config = Config(args.config)
    from pgica_tpu.utils.factories import apply_hardware_rng
    apply_hardware_rng(config)
    if args.quant:
        config.set("inference.quantization", args.quant)
    if args.scheduler == "continuous":
        service = ContinuousCaptionService(
            config, model_path=args.model_path, slots=args.slots,
            chunk=args.chunk, max_length=args.max_length,
        )
    else:
        service = CaptionService(
            config, model_path=args.model_path, max_batch=args.max_batch,
            batch_wait_ms=args.batch_wait_ms, max_length=args.max_length,
            workers=args.workers, batch_wait_max_ms=args.batch_wait_max_ms,
            early_stop=not args.no_early_stop,
        )
    if args.prejit:
        print("prejit: compiling decode buckets into the persistent cache...", file=sys.stderr)
        for b, secs in service.warmup(start_worker=False):
            print(f"  bucket {b:>3}: {secs:.1f}s", file=sys.stderr)
        print("prejit done; subsequent serve starts reuse the cache", file=sys.stderr)
        return
    print("warming up decode buckets...", file=sys.stderr)
    service.warmup()
    class _Server(ThreadingHTTPServer):
        # Default listen backlog is 5: a 16-way connect storm drops accepts
        # (clients see ECONNRESET and pay a retry). 64 absorbs any burst the
        # compiled buckets can ride. Must be a class attr — __init__ binds
        # and listens with it.
        request_queue_size = 64

    server = _Server(("0.0.0.0", args.port), make_handler(service))
    print(f"serving on :{args.port} (buckets {service.buckets})", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.shutdown()


if __name__ == "__main__":
    main()
