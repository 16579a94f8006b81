"""Continuous-batching scheduler (policy parity with reference
scheduler/base.py, re-built around the TPU worker).

One scheduler daemon owns one model replica. Per step it:
  1. drains new requests from ZMQ (non-blocking),
  2. selects a detokenize batch by (interval, overlap) windows,
  3. selects an LM batch — at most one prefill, else up to max_batch_size
     decodes,
  4. runs detokenize, streams AUDIO/COMPLETION messages, runs the LM step.

Wire protocol (preserved bit-for-bit from the reference):
  API -> scheduler: ``<json>|<body>`` where json carries request_id, prompt,
      audio_path, is_streaming, model_kwargs; plus input-streaming messages
      ``rid|TEXT_STREAM_START|cfg`` / ``rid|TEXT_UPDATE|text`` /
      ``rid|TEXT_COMPLETE|``.
  scheduler -> API: ``rid|AUDIO|<pcm16 bytes>`` and ``rid|COMPLETION|<json>``.

JAX's async dispatch already overlaps host scheduling with device execution
inside the worker; the `async_scheduling` flag additionally overlaps ZMQ and
response IO using a deferred-readback step (reference's asyncio.gather
analogue, scheduler/base.py:168-215).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import zmq

from ..requests import Request
from ..utils import RankLogger, get_logger
from ..worker.base import ModelWorker


def request_ipc_path(rank: int = 0, suffix: str = "") -> str:
    return f"ipc:///tmp/vox_serve_request_{rank}{suffix}.ipc"


def result_ipc_path(suffix: str = "") -> str:
    return f"ipc:///tmp/vox_serve_result{suffix}.ipc"


class Scheduler:
    def __init__(
        self,
        model_worker: ModelWorker,
        max_batch_size: int = 8,
        rank: int = 0,
        socket_suffix: str = "",
        async_scheduling: bool = False,
        zmq_context: Optional[zmq.Context] = None,
        connect: bool = True,
    ):
        self.model_worker = model_worker
        self.max_batch_size = max_batch_size
        self.rank = rank
        self.async_scheduling = async_scheduling
        self.active_requests: list[Request] = []
        self.logger = RankLogger(get_logger("scheduler"), rank)
        # latency/throughput regime latch (see _throughput_regime)
        self._regime_fused = False

        model = model_worker.model
        self.sample_rate = model.sample_rate
        self.channels = model.n_channels
        self.bytes_per_sample = 2

        self.request_socket = None
        self.result_socket = None
        self._inproc_results: list[bytes] = []
        if connect:
            ctx = zmq_context or zmq.Context.instance()
            self.request_socket = ctx.socket(zmq.PULL)
            self.request_socket.setsockopt(zmq.RCVHWM, 1024)
            self.request_socket.bind(request_ipc_path(rank, socket_suffix))
            self.result_socket = ctx.socket(zmq.PUSH)
            self.result_socket.setsockopt(zmq.SNDHWM, 1024)
            self.result_socket.setsockopt(zmq.LINGER, 0)
            self.result_socket.connect(result_ipc_path(socket_suffix))

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------
    def run_forever(self) -> None:
        self.logger.info("scheduler loop starting (rank %s)", self.rank)
        # readiness signal: the API server's /health reports warming until
        # every rank has finished model init + warmup
        # assets_available=False means dev tokenizer / random weights are in
        # play — surfaced through /health so clients don't mistake dev-mode
        # hash-token audio for real output
        model = getattr(self.model_worker, "model", None)
        self._send(b"__scheduler__|READY|" + json.dumps({
            "rank": self.rank,
            "assets_available": bool(getattr(model, "assets_available", True)),
        }).encode())
        import os

        idle_steps = 0
        last_report = time.monotonic()
        while True:
            did_work = self._step()
            now = time.monotonic()
            if now - last_report > 5.0:
                last_report = now
                if os.getppid() == 1:
                    # parent (API server) is gone; don't linger as an orphan
                    self.logger.info("parent process gone; scheduler exiting")
                    return
                for r in self.active_requests:
                    self.logger.info(
                        "state %s gen=%d audio_toks=%d prefill=%s gen_done=%s "
                        "all=%s next_idx=%s pressing=%s waiting=%s",
                        r.request_id[:8], r.num_generated,
                        len(r.lm_output_audio_tokens), r.done_lm_prefill,
                        r.done_lm_generation, r.done_all,
                        r.next_audio_decode_idx, r.is_pressing,
                        r.waiting_for_text)
            if did_work:
                idle_steps = 0
                continue
            idle_steps += 1
            time.sleep(0.0005 if idle_steps < 200 else 0.005)

    def _step(self) -> bool:
        self._prepare_requests()
        # top-of-round poll: surface results that finished on device during
        # the previous round's host-side tail BEFORE this round's detok
        # selection runs. Without it, a ramp mini whose tokens resolved
        # late in round t was only selected at round t+2's top — one full
        # round (~50-100 ms at fused-k granularity) of pure latency on the
        # chunk-2 playback deadline, measured as the systematic ~25-75 ms
        # chunk-idx-1 misses at rates 1-2 (goodput run8 late-chunk
        # telemetry). Non-blocking; costs two is_ready checks when idle.
        poll = getattr(self.model_worker, "poll_resolved", None)
        if poll is not None:
            touched = poll()
            for r in self.active_requests:
                if r not in touched and not r.output_audio.empty():
                    touched.append(r)
            if touched:
                self._send_responses(touched)
        detok = self._select_detokenize_requests()
        lm = self._select_lm_requests()
        admission = bool(lm) and not lm[0].done_lm_prefill

        # per-batch error isolation: a failing request must not kill the rank
        # (the reference daemon dies on any model/worker exception) — fail the
        # offending batch with error completions and keep serving

        # admission-priority dispatch: a new stream's prefill (or cold
        # chain) goes to the device queue BEFORE this round's detokenize
        # batch — a wide detok dispatch ahead of the prefill added its full
        # device time to HTTP TTFA (measured ~110 ms at the B=80 bucket)
        dec: list[Request] = []
        if admission:
            now = time.monotonic()
            for r in lm:
                r.lifecycle.setdefault("prefill_dispatch", now)
            try:
                if self._maybe_cold_start(lm):
                    # the cold chain serves only the new stream; the
                    # in-flight batch must still decode this round.
                    # Skipping it cost every live stream a full round per
                    # admission and collapsed rate-1 HTTP all-chunks
                    # viability 95.8% -> 22% (artifacts/goodput_tpu_r5_run1.json)
                    # once the cold gate widened to B/2.
                    dec = self._select_decode_after_prefill(
                        lm, exclude=lm)
                else:
                    self.model_worker.run_lm_prefill(lm)
                    self._apply_admission_ramp_policy(lm)
                    # prefill must not starve decode: the round's fixed
                    # dispatch cost dwarfs the prefill executable, so
                    # the in-flight streams' decode batch runs in the
                    # SAME round (under churn, admission rounds were
                    # half of all rounds and ran no decode at all)
                    dec = self._select_decode_after_prefill(lm)
            except Exception as e:
                self._fail_requests(lm, e, "lm step")

        try:
            emitted = self.model_worker.run_detokenize(detok)
        except Exception as e:
            self._fail_requests(detok, e, "detokenize")
            emitted = []
        self._send_responses(emitted)

        if lm and not admission:
            try:
                self._run_decode(lm)
            except Exception as e:
                self._fail_requests(lm, e, "lm step")
        elif dec:
            try:
                self._run_decode(dec)
            except Exception as e:
                self._fail_requests(dec, e, "lm step")
        if (len(self.active_requests) <= 2
                and hasattr(self.model_worker, "sync")):
            # light load: the readback pipeline only adds first-chunk latency
            # (host token visibility lags pipeline_depth steps); resolve
            # eagerly so TTFA doesn't pay it. Under load the pipeline stays
            # and already-computed results surface through the non-blocking
            # poll below — the r5 eager-sync variant (full pipeline drain
            # whenever an admission's first chunk was in flight) stalled
            # every live stream once per admission and collapsed HTTP
            # all-chunks viability 95.8% -> 22-32% at rate 1
            # (artifacts/goodput_tpu_r5_run1.json vs _ab_r4sched.json).
            self.model_worker.sync()
            # eager detokenize: windows completed by THIS step's LM run
            # would otherwise wait a scheduler round to be selected and a
            # second one for the pipelined readback — two more tunnel round
            # trips on the first-chunk path
            extra = self._select_detokenize_requests()
            emitted = []
            if extra:
                try:
                    emitted = self.model_worker.run_detokenize(extra)
                except Exception as e:
                    self._fail_requests(extra, e, "detokenize")
            flush = getattr(self.model_worker, "flush_detokenize", None)
            if flush is not None:
                emitted = emitted + flush()
            # audio queued outside a detok batch (cold-start fast path)
            for r in self.active_requests:
                if r not in emitted and not r.output_audio.empty():
                    emitted.append(r)
            self._send_responses(emitted)
        else:
            # under load: surface any ALREADY-computed pipeline results
            # (cold-chain first chunks, pipelined detok audio) without
            # blocking — jax.Array.is_ready front-first polling. First PCM
            # leaves the step after its device work completes instead of
            # pipeline_depth rounds later, at zero cost to cadence.
            poll = getattr(self.model_worker, "poll_resolved", None)
            if poll is not None:
                touched = poll()
                for r in self.active_requests:
                    if r not in touched and not r.output_audio.empty():
                        touched.append(r)
                if touched:
                    self._send_responses(touched)
        return bool(lm or detok)

    def _throughput_regime(self, n_decoding: int, fmin: int) -> bool:
        """Hysteresis latch between the latency regime (single-step rounds,
        cold chains, mini-chunk ramp) and the throughput regime (fused k
        rounds, full-window first chunks). Without it, load hovering around
        fused_min_batch flapped the regime every few rounds and streams
        admitted with a mini ramp were then served at fused-round
        granularity (~300 ms), structurally missing their early-chunk
        playback deadlines — measured as the rate-2/4 all-chunks viability
        dip (62/60%) between healthy rate-1 (95.1%) and rate-8/10 (93-96%)
        in artifacts/goodput_tpu_r5_run4.json. Flip up at fused_min_batch,
        down at 2/3 of it, so a transition happens once per load shift and
        at most ~one admission-burst of ramping streams is ever caught."""
        if self._regime_fused:
            if n_decoding < max(1, (2 * fmin) // 3):
                self._regime_fused = False
                self.logger.info("regime -> latency (decoding=%d)",
                                 n_decoding)
        elif n_decoding >= fmin:
            self._regime_fused = True
            self.logger.info("regime -> throughput (decoding=%d)",
                             n_decoding)
            self._graduate_ramping_streams()
        return self._regime_fused

    def _graduate_ramping_streams(self) -> None:
        """On the latch's up-flip, end the mini-chunk ramp for every stream
        still in it: 3-frame chunks due every 0.25 s are structurally late
        at fused-round granularity (~330 ms at the full bucket), and a
        rate-8 ramp-up catches up to ~fmin ramping streams in one flip
        (goodput run9: rate-8 all-chunks 54.6% vs 92.7% with ramps skipped
        throughout). Streams that already sent minis hand off to regular
        full windows from their current ramp position (same bookkeeping as
        the worker's ramp-completion handoff); streams with no chunk yet
        get ramp-skip semantics (first chunk = one full window)."""
        w = self.model_worker
        interval = getattr(w, "detokenize_interval", 0)
        if not interval or not getattr(w, "first_chunk_frames", 0):
            return
        ramp_end = getattr(w, "ramp_frames", interval) or interval
        step = interval - getattr(w, "detokenize_overlap", 0)
        for r in self.active_requests:
            if not r.is_streaming or r.done_all:
                continue
            if r.extras.get("mini_chunk"):
                # selected for a mini THIS round but not yet dispatched:
                # the pending mini reads ramp_next — graduate next round
                continue
            pos = r.extras.get("ramp_next", None)
            if pos is not None and pos >= ramp_end:
                continue  # ramp already complete
            if r.audio_decode_idx or r.next_audio_decode_idx:
                continue  # already on regular windows
            if not pos:
                # no mini sent yet: plain ramp-skip (full first window)
                r.extras["ramp_next"] = ramp_end
                continue
            r.extras["ramp_next"] = ramp_end
            r.audio_decode_idx = [pos - step]
            r.next_audio_decode_idx = [pos - step]

    def _apply_admission_ramp_policy(self, admitted: list[Request]) -> None:
        """Under load, newly admitted streams SKIP the mini-chunk TTFA ramp.

        A tiny (first_chunk_frames) first chunk starts the client's playback
        clock with only ~0.25 s of buffered audio; at fused-round step
        granularity (~300 ms at the 96/144 buckets) chunk 2 then structurally
        misses its playback deadline — measured as rate-1 HTTP all-chunks
        viability 22-32% with the ramp active under load vs 97.6% without
        (artifacts/goodput_tpu_r5_run1.json vs _ab_r4sched.json). Advancing
        ramp_next to the ramp end makes the first chunk a full detokenize
        window (interval frames ≈ 0.83 s at 12 Hz), so every later deadline
        is reachable at fused granularity. Light-load admissions keep the
        fast ramp (and the cold chain) for TTFA."""
        cfg = getattr(self.model_worker, "config", None)
        fmin = getattr(cfg, "fused_min_batch", None) if cfg else None
        if not fmin:
            return
        # admission backlog counts as load (see OnlineScheduler.
        # _prepare_requests): a saturation-wave's queued admissions must
        # NOT take the mini ramp just because live decode momentarily hit
        # 0 — the wave itself (including this admitted batch) will be
        # decoding together within a few rounds, at fused-round granularity
        decoding = max(
            sum(1 for r in self.active_requests
                if r.done_lm_prefill and not r.done_all
                and r not in admitted),
            getattr(self, "_load_pressure", 0))
        if not self._throughput_regime(decoding, fmin):
            return
        interval = self.model_worker.detokenize_interval
        ramp_end = getattr(self.model_worker, "ramp_frames",
                           interval) or interval
        for r in admitted:
            if r.is_streaming and "ramp_next" not in r.extras:
                r.extras["ramp_next"] = ramp_end

    def _run_decode(self, lm: list[Request]) -> None:
        """Dispatch the decode batch (fused multi-step when eligible)."""
        k = self._fused_decode_steps(lm)
        can_multi = getattr(self.model_worker, "can_decode_multi", None)
        if k > 1 and can_multi is not None and can_multi(lm, k):
            self.model_worker.run_lm_decode_multi(lm, k)
        else:
            self.model_worker.run_lm_decode(lm)

    def _select_decode_after_prefill(self, prefilled: list[Request],
                                     exclude: tuple | list = (),
                                     ) -> list[Request]:
        """The decode batch to co-dispatch with a prefill round. Re-runs
        the scheduler's LM selection with not-yet-prefilled requests hidden
        (the just-prefilled batch IS decode-eligible — its sampled feedback
        token is device-resident). ``exclude`` additionally hides requests
        already served this round by the cold chain."""
        saved = self.active_requests
        self.active_requests = [r for r in saved
                                if r.done_lm_prefill and r not in exclude]
        try:
            dec = self._select_lm_requests()
        finally:
            self.active_requests = saved
        if dec and not dec[0].done_lm_prefill:  # defensive
            return []
        return dec

    def _maybe_cold_start(self, lm: list[Request]) -> bool:
        """Hook: dispatch a streaming request's prefill + first chunk as one
        chained fast path. Only the online scheduler (which owns the
        first-chunk ramp bookkeeping) implements this."""
        return False

    def _fused_decode_steps(self, lm: list[Request]) -> int:
        """How many decode steps to fuse into one dispatch for this batch.

        Fused decode targets light load (batch fits the small fused-bucket
        lattice): a cold stream's first chunk otherwise costs
        first_chunk_frames separate dispatch rounds. Input-streaming
        requests cap k at their available text tokens so pad/EOS injection
        semantics stay step-accurate (worker._inject_streaming_text_token)."""
        w = self.model_worker
        cfg = getattr(w, "config", None)
        k = getattr(cfg, "fused_decode_steps", 0) if cfg else 0
        if not k:
            return 1
        if getattr(cfg, "fused_k_schedule", None) \
                and hasattr(w, "fused_k_for"):
            # per-bucket granularity schedule, applied in the LATENCY
            # regime only: small k at mid buckets keeps rounds fine-grained
            # for ramping streams' early-chunk deadlines (chunk 2 rides two
            # pipeline rounds against a 0.25 s budget). In the throughput
            # regime every live stream holds a full-window playback buffer,
            # granularity is irrelevant, and mid-size batches (post-wave
            # catch-up at saturation) must run at max k — k=2 catch-up
            # measured 24.4% per-chunk viability at rate 8 (goodput run10)
            # vs 85.8%+ at full k.
            fmin = getattr(cfg, "fused_min_batch", None)
            load = max(len(lm), getattr(self, "_load_pressure", 0))
            if fmin and self._throughput_regime(load, fmin):
                k = cfg.fused_decode_steps
            else:
                k = w.fused_k_for(len(lm))
            if k < 2:
                return 1
        else:
            fmin = getattr(cfg, "fused_min_batch", None) if cfg else None
            if fmin and not self._throughput_regime(len(lm), fmin):
                # latency regime: single-step rounds keep step granularity
                # ~3-5x finer than a fused round, so early-chunk playback
                # deadlines (which quantize to whole rounds through select ->
                # dispatch -> poll) are reachable. The small batch has ample
                # RTF headroom without fusing (see
                # WorkerConfig.fused_min_batch).
                return 1
        buckets = getattr(cfg, "fused_decode_buckets", ())
        if len(lm) > max(buckets, default=0):
            return 1
        for r in lm:
            if r.is_input_streaming and not r.text_complete \
                    and r.pending_text_tokens.qsize() < k:
                # warmup compiles ONLY (bucket, fused_decode_steps):
                # dispatching a smaller k would trigger a multi-minute XLA
                # compile mid-serving. Fall back to the (always-compiled)
                # single-step path until enough text is buffered.
                return 1
        return k

    def _fail_requests(self, requests: list[Request], exc: Exception,
                       phase: str) -> None:
        self.logger.error("%s failed (%s: %s); failing %d request(s)",
                          phase, type(exc).__name__, exc, len(requests),
                          exc_info=True)
        for req in requests:
            self.model_worker.fail_request(req, f"{phase}: {exc}")
            self._send_completion(req)

    # ------------------------------------------------------------------
    # request intake
    # ------------------------------------------------------------------
    def _prepare_requests(self) -> None:
        if self.request_socket is not None:
            while True:
                try:
                    payload = self.request_socket.recv(flags=zmq.NOBLOCK)
                except zmq.Again:
                    break
                except Exception as e:  # pragma: no cover
                    self.logger.error("recv error: %s", e)
                    break
                self._handle_message(payload)
        # drop completed requests — but never before their COMPLETION message
        # went out (a done_all request that was never selected for a final
        # detokenize batch would otherwise vanish silently and hang clients)
        kept = []
        for r in self.active_requests:
            if not r.done_all:
                kept.append(r)
            elif not r.extras.get("completion_sent"):
                self._send_completion(r)
        self.active_requests = kept

    def _handle_message(self, payload: bytes) -> None:
        req = self._handle_request_payload(payload)
        if req is not None:
            self.enqueue_request(req)

    def enqueue_request(self, req: Request) -> None:
        """Admit a request into the active set (also the in-process entry
        point used by tests and the offline engine)."""
        self.logger.debug("request %s joined (streaming=%s)",
                          req.request_id, req.is_streaming)
        req.lifecycle.setdefault("recv", time.monotonic())
        self.active_requests.append(req)

    def _handle_request_payload(self, payload: bytes) -> Optional[Request]:
        if b"|" not in payload:
            self.logger.warning("malformed request message: %r", payload[:50])
            return None
        try:
            # the frame is <json>|<body>, but the prompt (inside the JSON)
            # may itself contain '|' — splitting at the FIRST pipe truncated
            # the JSON and silently dropped the request. raw_decode consumes
            # exactly the JSON prefix; latin-1 is a byte<->char bijection and
            # the sender's json.dumps is ensure_ascii, so indices line up.
            text = payload.decode("latin-1")
            d, end = json.JSONDecoder().raw_decode(text)
            if end >= len(payload) or payload[end:end + 1] != b"|":
                raise ValueError("missing frame separator after JSON")
        except Exception:
            self.logger.warning("bad request JSON: %r", payload[:80])
            return None
        return Request(
            request_id=d["request_id"],
            prompt=d.get("prompt"),
            audio_path=(d.get("audio_path")
                        if self.model_worker.supports_audio_input else None),
            is_streaming=d.get("is_streaming", False),
            # streaming requests start pressing (first chunk is the deadline)
            is_pressing=d.get("is_streaming", False),
            model_kwargs=d.get("model_kwargs", {}),
        )

    # ------------------------------------------------------------------
    # batch selection (reference scheduler/base.py:234-333)
    # ------------------------------------------------------------------
    def _pack_prefills(self, prefill: list[Request]) -> list[Request]:
        """Pack admissible prefills into one batch: up to the worker's
        max_prefill_requests, within the prefill token bucket. (One
        admission per round could not keep up with completion churn at
        full batch, and each extra round costs a full dispatch cycle.)"""
        worker = self.model_worker
        budget = worker.max_prefill_tokens
        cap = getattr(getattr(worker, "config", None),
                      "max_prefill_requests", 1)
        sel: list[Request] = []
        for req in prefill:
            est = req.input_length or self._estimate_prompt_len(req)
            if est <= budget and worker.can_admit(est):
                sel.append(req)
                budget -= est
                if len(sel) >= cap:
                    break
        return sel

    def _select_lm_requests(self) -> list[Request]:
        prefill, decode = [], []
        for req in self.active_requests:
            if req.done_lm_generation:
                continue
            if not req.done_lm_prefill:
                prefill.append(req)
            else:
                decode.append(req)

        sel = self._pack_prefills(prefill)
        if sel:
            return sel

        return decode[: self.max_batch_size]

    def _estimate_prompt_len(self, req: Request) -> int:
        return min(len(req.prompt or "") + 8, self.model_worker.max_prefill_tokens)

    def _select_detokenize_requests(self) -> list[Request]:
        out = []
        interval = self.model_worker.detokenize_interval
        step = interval - self.model_worker.detokenize_overlap
        for req in self.active_requests:
            if len(out) >= self.max_batch_size:
                break
            next_idx = (req.next_audio_decode_idx[-1] + step
                        if req.next_audio_decode_idx else 0)
            if req.done_lm_generation:
                if next_idx < len(req.lm_output_audio_tokens):
                    req.next_audio_decode_idx = [next_idx]
                    out.append(req)
                else:
                    # generation ended exactly on a window boundary: clear the
                    # (already-decoded) window indices or run_detokenize would
                    # re-decode and re-emit the final chunk (duplicate audio +
                    # a second advance of stateful codec caches)
                    req.next_audio_decode_idx = []
                    req.done_all = True
                    out.append(req)
            elif next_idx + interval <= len(req.lm_output_audio_tokens):
                req.next_audio_decode_idx = [next_idx]
                out.append(req)
        return out

    # ------------------------------------------------------------------
    # responses
    # ------------------------------------------------------------------
    def _send_responses(self, detok_requests: list[Request]) -> None:
        for req in detok_requests:
            while not req.output_audio.empty():
                chunk = req.output_audio.get()
                req.lifecycle.setdefault("first_audio", time.monotonic())
                if req.is_streaming:
                    req.chunk_send_timestamps.append(time.time())
                    req.chunk_durations.append(
                        self._calculate_chunk_duration(chunk))
                self._send(req.request_id.encode() + b"|AUDIO|" + chunk)
            if req.done_all:
                self._send_completion(req)

    def _send_completion(self, req: Request) -> None:
        if req.extras.get("completion_sent"):
            return
        # drain any chunks produced by the final detokenize
        while not req.output_audio.empty():
            chunk = req.output_audio.get()
            self._send(req.request_id.encode() + b"|AUDIO|" + chunk)
        self.model_worker.free_kv_cache(req)
        msg = {"status": "completed",
               "reason": req.finish_reason or "unknown"}
        lc = req.lifecycle
        if "recv" in lc:
            timing = {}
            if "prefill_dispatch" in lc:
                timing["queue_ms"] = (lc["prefill_dispatch"]
                                      - lc["recv"]) * 1e3
            if "first_audio" in lc:
                timing["ttfa_server_ms"] = (lc["first_audio"]
                                            - lc["recv"]) * 1e3
            if timing:
                msg["timing"] = {k: round(v, 1) for k, v in timing.items()}
                self.logger.info(
                    "lifecycle %s %s", req.request_id[:8],
                    " ".join(f"{k}={v:.1f}" for k, v in timing.items()))
        self._send(req.request_id.encode() + b"|COMPLETION|"
                   + json.dumps(msg).encode())
        req.extras["completion_sent"] = True

    def _send(self, message: bytes) -> None:
        if self.result_socket is not None:
            self.result_socket.send(message)
        else:  # in-process mode (tests / offline engine)
            self._inproc_results.append(message)

    def _calculate_chunk_duration(self, chunk: bytes) -> float:
        n = len(chunk) // (self.channels * self.bytes_per_sample)
        return n / self.sample_rate
