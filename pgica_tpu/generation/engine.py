"""Iteration-level continuous batching for caption decode (serving).

The batch scheduler in ``scripts/serve.py`` admits requests only *between*
decodes: a request that misses a decode's batching window waits for that
entire decode (up to max_length tokens) plus its own. This engine admits
requests between decode *steps* instead, vLLM-style, adapted to TPU/XLA
static-shape constraints:

* a fixed pool of S decode **slots** (one compiled graph, shapes never
  change); each slot carries its own KV cache rows, write position,
  repetition-penalty presence and active flag;
* the per-slot write position makes the decode step per-row: cache writes
  use a one-hot select at each row's own timestep (models/layers.py) and
  GPT-2's learned position embedding is gathered per row
  (models/decoder.py:decode_step);
* decode advances in **chunks** of C steps per jitted call (`lax.scan`);
  between chunks the host admits new requests into free slots (vision
  encode + prefix for the admission bucket, then a row scatter into the
  slot state) and harvests finished captions;
* the device never waits for the host: a dispatch thread keeps up to
  ``max_inflight`` chunks queued while a separate fetch thread pulls the
  (tiny) active/seqs snapshots — on the axon tunnel a blocking fetch costs
  ~30 ms RTT, so fetches are pipelined one chunk behind dispatch.

Token-level semantics are identical to the batch path for greedy decode
(same argmax, repetition penalty, EOS handling — see tests/test_engine.py);
sampling uses the same per-step key-split discipline but a different key
stream than a fresh batch decode would (slots join mid-stream).

Reference analog: the serving latency target configs/default.yaml:92
(latency_ms_p95: 150) over the reference's HF ``generate()`` decode
(reference model.py:663-678); the reference has no serving scheduler at all.
"""

from __future__ import annotations

import functools
import logging
import queue
import threading
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pgica_tpu.generation.decode import _apply_repetition_penalty, _top_p_filter
from pgica_tpu.models.lm import init_kv_cache

logger = logging.getLogger(__name__)


def _pick(logits, presence, key, *, do_sample, temperature, top_p, repetition_penalty):
    """Next-token choice — identical math to decode.py's ``pick``."""
    logits = _apply_repetition_penalty(logits.astype(jnp.float32), presence, repetition_penalty)
    if do_sample:
        logits = logits / jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-6)
        logits = _top_p_filter(logits, top_p)
        return jax.random.categorical(key, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)


def make_engine_fns(
    encode_module,
    decode_module,
    *,
    slots: int,
    chunk: int,
    max_length: int,
    eos_token_id: int,
    pad_token_id: int,
    do_sample: bool = False,
):
    """Build (init_state, admit_fn, chunk_fn) for a slot pool.

    ``encode_module`` runs the vision tower (full-precision params);
    ``decode_module`` runs prefix/step (possibly the int8 twin). Both are
    closed over statically so jit caches one executable per admission bucket
    plus one for the chunk.
    """
    from pgica_tpu.data.augment import prepare_images

    cfg = decode_module.decoder_config
    vocab = cfg.vocab_size
    cache_len = max_length + 1  # +1 for the vision token at position 0
    dtype = decode_module.dtype

    def init_state(rng):
        return {
            "caches": init_kv_cache(cfg, slots, cache_len, dtype),
            "seqs": jnp.full((slots, max_length), pad_token_id, jnp.int32),
            "pos": jnp.zeros((slots,), jnp.int32),
            "tok": jnp.full((slots,), pad_token_id, jnp.int32),
            "presence": jnp.zeros((slots, vocab), jnp.int32),
            "active": jnp.zeros((slots,), bool),
            "rng": rng,
        }

    @functools.partial(jax.jit, donate_argnums=(2,))
    def admit_fn(enc_params, dec_params, state, images, slot_ids,
                 temperature, top_p, repetition_penalty):
        """Vision-encode + prefix an admission bucket, scatter into slots.

        ``slot_ids`` rows >= ``slots`` are padding and are dropped by the
        scatter (jnp ``mode='drop'``).
        """
        a = images.shape[0]
        emb = encode_module.apply(
            {"params": enc_params}, prepare_images(images), method="encode_image"
        )["embeddings"]
        new_caches = init_kv_cache(cfg, a, cache_len, dtype)
        # prefix attends to position 0 only
        mask = (jnp.arange(cache_len)[None, :] <= 0).astype(jnp.int32).repeat(a, 0)
        first_logits, new_caches = decode_module.apply(
            {"params": dec_params}, emb, new_caches, mask, method="decode_prefix"
        )
        rng, key = jax.random.split(state["rng"])
        tok0 = _pick(
            first_logits, jnp.zeros((a, vocab), jnp.int32), key,
            do_sample=do_sample, temperature=temperature, top_p=top_p,
            repetition_penalty=repetition_penalty,
        ).astype(jnp.int32)

        def scatter_rows(dst, src):
            return dst.at[slot_ids].set(src.astype(dst.dtype), mode="drop")

        caches = jax.tree.map(scatter_rows, state["caches"], new_caches)
        row = jnp.full((a, max_length), pad_token_id, jnp.int32).at[:, 0].set(tok0)
        return {
            "caches": caches,
            "seqs": scatter_rows(state["seqs"], row),
            "pos": state["pos"].at[slot_ids].set(1, mode="drop"),
            "tok": scatter_rows(state["tok"], tok0),
            "presence": scatter_rows(
                state["presence"], jax.nn.one_hot(tok0, vocab, dtype=jnp.int32)
            ),
            # first token may already be EOS (parity with decode.py finished0)
            "active": scatter_rows(state["active"], (tok0 != eos_token_id) & (max_length > 1)),
            "rng": rng,
        }

    @functools.partial(jax.jit, donate_argnums=(1,))
    def chunk_fn(dec_params, state, temperature, top_p, repetition_penalty):
        """Advance every slot by up to ``chunk`` tokens; inactive slots no-op.

        Returns (state, snapshot) where snapshot is an (S, max_length + 1)
        int32 of [seqs | active] CONCATENATED into one fresh buffer — it must
        not alias any state leaf, because the host fetches it while the next
        chunk (which donates the state) is already dispatched.
        """

        def one(carry, _):
            caches, seqs, pos, tok, presence, active, rng = carry
            rng, key = jax.random.split(rng)
            mask = (jnp.arange(cache_len)[None, :] <= pos[:, None]).astype(jnp.int32)
            logits, caches = decode_module.apply(
                {"params": dec_params}, tok[:, None], pos, caches, mask,
                method="decode_step",
            )
            nxt = _pick(
                logits, presence, key,
                do_sample=do_sample, temperature=temperature, top_p=top_p,
                repetition_penalty=repetition_penalty,
            ).astype(jnp.int32)
            nxt = jnp.where(active, nxt, pad_token_id)
            colhit = (jnp.arange(max_length)[None, :] == pos[:, None]) & active[:, None]
            seqs = jnp.where(colhit, nxt[:, None], seqs)
            presence = jnp.maximum(
                presence,
                jax.nn.one_hot(nxt, vocab, dtype=jnp.int32) * active[:, None].astype(jnp.int32),
            )
            new_active = active & (nxt != eos_token_id) & (pos + 1 < max_length)
            pos = pos + active.astype(pos.dtype)
            tok = jnp.where(active, nxt, tok)
            return (caches, seqs, pos, tok, presence, new_active, rng), ()

        carry = (
            state["caches"], state["seqs"], state["pos"], state["tok"],
            state["presence"], state["active"], state["rng"],
        )
        carry, _ = jax.lax.scan(one, carry, None, length=chunk)
        caches, seqs, pos, tok, presence, active, rng = carry
        new_state = {
            "caches": caches, "seqs": seqs, "pos": pos, "tok": tok,
            "presence": presence, "active": active, "rng": rng,
        }
        snap = jnp.concatenate([seqs, active.astype(jnp.int32)[:, None]], axis=1)
        return new_state, snap

    return init_state, admit_fn, chunk_fn


class ContinuousDecodeEngine:
    """Continuous-batching caption decoder over a slot pool.

    Public surface mirrors what serving needs: ``warmup()``, blocking
    ``submit(image) -> caption``, ``stop()``. Internally a dispatch thread
    owns the device stream (admissions + decode chunks, never blocking on
    results) and a fetch thread pulls per-chunk snapshots, completes finished
    requests, and frees their slots.
    """

    def __init__(
        self,
        model,
        *,
        slots: int = 16,
        chunk: int = 8,
        max_length: int = 32,
        temperature: float = 1.0,
        top_p: float = 1.0,
        repetition_penalty: float = 1.0,
        do_sample: bool = False,
        seed: int = 0,
        max_inflight: int = 3,
        fetch_threads: int = 2,
    ):
        self.model = model
        self.tokenizer = model.tokenizer
        self.slots = int(slots)
        self.chunk = int(chunk)
        self.max_length = int(max_length)
        self.sampling = (
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_p, jnp.float32),
            jnp.asarray(repetition_penalty, jnp.float32),
        )
        self._enc_params = model._inference_params()
        decode_module, self._dec_params = model._decode_module_and_params()
        self._init_state, self._admit, self._chunk = make_engine_fns(
            model.module, decode_module,
            slots=self.slots, chunk=self.chunk, max_length=self.max_length,
            eos_token_id=self.tokenizer.eos_token_id,
            pad_token_id=self.tokenizer.pad_token_id,
            do_sample=do_sample,
        )
        self._state = self._init_state(jax.random.PRNGKey(seed))
        self._seed = int(seed)
        self.buckets = [b for b in (1, 2, 4, 8, 16, 32, 64) if b <= self.slots]
        # Non-power-of-two slot pools (e.g. --slots 24) must still be able to
        # admit a full burst in one bucket: without this, a burst larger than
        # the top power of two is split and the overflow re-queued out of
        # FIFO order, capping admission width below the free-slot count.
        if self.buckets[-1] != self.slots:
            self.buckets.append(self.slots)

        self._queue: "queue.Queue" = queue.Queue()
        self._fetchq: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._work = threading.Event()  # something to do (arrivals or active slots)
        # host slot table: None = free, else {request dict, 'seq': admit seq}
        self._table: List[Optional[dict]] = [None] * self.slots
        self._free = list(range(self.slots))
        self._outstanding = 0  # admitted, not yet harvested
        self._chunk_seq = 0
        self._inflight = threading.Semaphore(max(1, int(max_inflight)))
        # >1 fetch threads overlap the ~30 ms tunnel-RTT snapshot fetches so
        # the chunk cadence stays device-bound, not RTT-bound. Out-of-order
        # harvests are safe: a slot only ever goes inactive once per
        # occupancy, and the per-slot admit seq guard skips pre-admission
        # snapshots.
        self._n_fetch = max(1, int(fetch_threads))
        self._threads = [
            threading.Thread(target=self._dispatch_loop, daemon=True, name="engine-dispatch"),
        ] + [
            threading.Thread(target=self._fetch_loop, daemon=True, name=f"engine-fetch-{i}")
            for i in range(self._n_fetch)
        ]
        self._started = False
        # instrumentation (PROFILE_serve.md): admits by bucket, chunk count,
        # per-request (queue-to-admit, total) latencies, fetch RTTs
        self.counters = {"chunks": 0, "admits": {}, "fetch_ms": []}
        self._req_phases = []

    # -- lifecycle -----------------------------------------------------------------

    def warmup(self) -> List:
        """Compile the chunk graph + every admission bucket. Returns timings."""
        size = self.model.image_size
        timings = []
        state = self._state
        for b in self.buckets:
            t0 = time.perf_counter()
            imgs = jnp.zeros((b, size, size, 3), jnp.uint8)
            ids = jnp.full((b,), self.slots, jnp.int32)  # all padding: drop
            state = self._admit(self._enc_params, self._dec_params, state,
                                imgs, ids, *self.sampling)
            jax.block_until_ready(state["pos"])
            timings.append((b, time.perf_counter() - t0))
        t0 = time.perf_counter()
        state, snap = self._chunk(self._dec_params, state, *self.sampling)
        jax.block_until_ready(snap)
        timings.append(("chunk", time.perf_counter() - t0))
        self._state = state
        return timings

    def start(self):
        if not self._started:
            self._started = True
            for t in self._threads:
                t.start()

    def stop(self):
        self._stop.set()
        self._work.set()
        self._inflight.release()  # unblock a dispatch waiting on the semaphore
        for _ in range(self._n_fetch):
            self._fetchq.put(None)

    def stats(self) -> dict:
        with self._lock:
            phases = list(self._req_phases)
            counters = {
                "chunks": self.counters["chunks"],
                "admits": dict(self.counters["admits"]),
                "fetch_ms": list(self.counters["fetch_ms"][-200:]),
            }
        out = {"chunks_dispatched": counters["chunks"], "admits_by_bucket": counters["admits"]}
        if counters["fetch_ms"]:
            out["fetch_rtt_p50_ms"] = round(float(np.percentile(counters["fetch_ms"], 50)), 1)
        if phases:
            qa = [p[0] for p in phases[-500:]]
            out["queue_to_admit_p50_ms"] = round(float(np.percentile(qa, 50)), 1)
            out["queue_to_admit_p95_ms"] = round(float(np.percentile(qa, 95)), 1)
        return out

    # -- request path ----------------------------------------------------------------

    def submit(self, image: np.ndarray, timeout: float = 30.0) -> dict:
        """Blocking: enqueue one uint8 HWC image, wait for its caption.

        Validates the image eagerly so a malformed direct-API call fails in
        the caller's thread instead of inside the dispatch daemon (which must
        never die — a dead dispatch thread hangs the whole service).
        """
        image = np.asarray(image)
        size = self.model.image_size
        if image.shape != (size, size, 3):
            raise ValueError(
                f"image must be HWC uint8 of shape ({size}, {size}, 3); got {image.shape}"
            )
        done = threading.Event()
        slot = {"image": image.astype(np.uint8, copy=False), "event": done,
                "caption": None, "error": None, "cancelled": False,
                "t0": time.perf_counter()}
        self._queue.put(slot)
        self._work.set()
        if not done.wait(timeout):
            # Mark so an un-admitted request is skipped at admission instead
            # of being decoded with no waiter (wasting a slot under overload).
            # Races with an in-progress admit are benign: worst case it is
            # decoded and harvested with no reader, exactly the old behavior.
            slot["cancelled"] = True
            raise TimeoutError("caption request timed out")
        if slot["error"] is not None:
            raise RuntimeError("caption request failed in the engine") from slot["error"]
        return {"caption": slot["caption"],
                "latency_ms": round(1000.0 * (time.perf_counter() - slot["t0"]), 2)}

    # -- dispatch thread ----------------------------------------------------------------

    def _take_arrivals(self) -> List[dict]:
        with self._lock:
            n_free = len(self._free)
        out = []
        while len(out) < n_free:
            try:
                r = self._queue.get_nowait()
            except queue.Empty:
                break
            if r.get("cancelled"):
                continue  # submit() timed out waiting; don't waste a slot
            out.append(r)
        return out

    def _fail_outstanding(self, exc: BaseException):
        """Fail every queued + admitted request and reset the slot pool.

        Called when the dispatch loop hits an unexpected error: the device
        state may be invalid (donated buffers), so the only safe recovery is
        to error out all in-flight work, rebuild a fresh state, and keep the
        daemon alive for future requests.
        """
        victims: List[dict] = []
        with self._lock:
            for s, entry in enumerate(self._table):
                if entry is not None:
                    victims.append(entry["req"])
                self._table[s] = None
            self._free = list(range(self.slots))
            self._outstanding = 0
        while True:
            try:
                victims.append(self._queue.get_nowait())
            except queue.Empty:
                break
        for req in victims:
            req["error"] = exc
            req["event"].set()
        try:
            self._state = self._init_state(jax.random.PRNGKey(self._seed))
        except Exception:
            logger.exception("engine state re-init failed; next dispatch will retry")

    def _dispatch_loop(self):
        """Daemon loop. The body is guarded: any error (bad admit input, a
        transient device failure mid-chunk) fails the outstanding requests and
        continues, instead of silently killing the thread and hanging every
        future submit() while /healthz still reports ok."""
        while not self._stop.is_set():
            try:
                self._dispatch_once()
            except Exception as exc:  # noqa: BLE001 — daemon must survive
                logger.exception("engine dispatch error; failing outstanding requests")
                self._fail_outstanding(exc)

    def _dispatch_once(self):
        """One dispatch iteration: admit what fits, then queue one chunk."""
        size = self.model.image_size
        arrivals = self._take_arrivals()
        if arrivals:
            a = len(arrivals)
            # buckets always end at self.slots, and arrivals <= free <= slots,
            # so one bucket always covers the whole burst (overflow re-queue
            # kept purely as a safety net).
            bucket = next(b for b in self.buckets if b >= a) if a <= self.buckets[-1] else self.buckets[-1]
            arrivals, overflow = arrivals[:bucket], arrivals[bucket:]
            for r in overflow:
                self._queue.put(r)
            images = np.zeros((bucket, size, size, 3), np.uint8)
            ids = np.full((bucket,), self.slots, np.int32)
            now = time.perf_counter()
            with self._lock:
                for i, req in enumerate(arrivals):
                    s = self._free.pop()
                    images[i] = req["image"]
                    ids[i] = s
                    req["t_admit"] = now
                    # snapshots from chunks dispatched before this admit
                    # must not harvest the new occupant
                    self._table[s] = {"req": req, "seq": self._chunk_seq}
                self._outstanding += len(arrivals)
                self.counters["admits"][bucket] = self.counters["admits"].get(bucket, 0) + 1
            self._state = self._admit(
                self._enc_params, self._dec_params, self._state,
                jnp.asarray(images), jnp.asarray(ids), *self.sampling,
            )
        with self._lock:
            busy = self._outstanding > 0
        if busy:
            # Wait for a chunk slot, but keep admissions flowing: a fetch
            # takes ~1 tunnel RTT (~30 ms), and a request arriving during
            # that wait should not queue behind it (measured: this wait
            # was the queue_to_admit p95 of ~80 ms under a 16-way burst).
            acquired = False
            while not self._stop.is_set():
                if self._inflight.acquire(timeout=0.004):
                    acquired = True
                    break
                if not self._queue.empty():
                    with self._lock:
                        has_free = bool(self._free)
                    if has_free:
                        break  # admit first, chunk next iteration
            if not acquired or self._stop.is_set():
                if acquired:
                    self._inflight.release()
                return
            try:
                self._chunk_seq += 1
                self.counters["chunks"] += 1
                self._state, snap = self._chunk(
                    self._dec_params, self._state, *self.sampling
                )
                self._fetchq.put((self._chunk_seq, snap))
            except BaseException:
                self._inflight.release()  # the fetch that would release never runs
                raise
        else:
            self._work.clear()
            if not self._queue.empty():
                return  # a submit raced the clear; re-check arrivals now
            # nothing active and no arrivals: sleep until a submit
            self._work.wait(timeout=0.05)

    # -- fetch thread ----------------------------------------------------------------

    def _fetch_loop(self):
        while True:
            item = self._fetchq.get()
            if item is None:
                return
            seq, snap = item
            t0 = time.perf_counter()
            try:
                snap_np = np.asarray(snap)  # blocks ~1 tunnel RTT
            except Exception:  # noqa: BLE001 — daemon must survive
                logger.exception("engine snapshot fetch failed; skipping chunk %d", seq)
                self._inflight.release()
                continue
            fetch_ms = 1000.0 * (time.perf_counter() - t0)
            seqs_np, active_np = snap_np[:, :-1], snap_np[:, -1].astype(bool)
            self._inflight.release()
            finished = []
            now = time.perf_counter()
            with self._lock:
                self.counters["fetch_ms"].append(fetch_ms)
                self.counters["fetch_ms"] = self.counters["fetch_ms"][-1000:]
                for s, entry in enumerate(self._table):
                    if entry is None or seq <= entry["seq"]:
                        continue  # free, or admitted after this chunk was dispatched
                    if not active_np[s]:
                        req = entry["req"]
                        finished.append((req, seqs_np[s]))
                        self._req_phases.append((
                            1000.0 * (req.get("t_admit", req["t0"]) - req["t0"]),
                            1000.0 * (now - req["t0"]),
                        ))
                        self._req_phases = self._req_phases[-1000:]
                        self._table[s] = None
                        self._free.append(s)
                        self._outstanding -= 1
            for req, row in finished:
                req["caption"] = self.tokenizer.decode(row)
                req["event"].set()
            if finished:
                self._work.set()
