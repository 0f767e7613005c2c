"""Continuous batching: admit new requests into a live decode batch.

The reference decodes a fixed batch until its LAST row finishes
(/root/reference/mellow/wrapper.py:247-256) — and so do ``generate`` /
``generate_cascade`` (the cascade only lets finished rows OUT). This
module adds the remaining serving capability tier: letting queued
requests IN, so a slot freed by a short answer immediately starts a new
request instead of idling until the whole batch drains (VERDICT r3
item 3).

TPU-first design — ragged rows WITHOUT ragged writes:

  * Every slot shares the same global cache write column (``length``):
    the per-step KV commit stays ONE ``dynamic_update_slice``, exactly as
    in the static loop — no per-row scatter (RMW-tile bound, CLAUDE.md).
  * A joiner admitted at global column ``c`` is prefilled with standard
    LOCAL positions [0, P) and its kv block inserted at columns
    [c-P, c); the slot records ``start = c - P``. Rows are independent
    under causal attention, so the ONLY per-row state the decode step
    needs is (a) the RoPE table row at the row's local position
    ``pos - start`` (a (B, hd) gather) and (b) a mask term
    ``column >= start`` (one broadcast compare) — both VPU-trivial.
    Row math is bitwise identical to a solo run of the same request
    (tests/test_continuous.py asserts token equality vs ``generate``).
  * Admission, like cascade compaction, happens on the host between
    jitted stages; each stage is the same windowed while_loop as
    ``generate`` and exits early (traced threshold) as soon as enough
    rows are done to be worth admitting into.
  * The einsum decode path only (the packed fused kernel has no per-row
    mask — its manual DMA skips un-flushed columns globally); llama
    family only. Slots are a fixed power-of-two batch; admission counts
    are bucketed so compile count stays bounded.

Capacity: the cache is a fixed [0, P + horizon) window. A request needing
``max_new`` tokens is admissible while ``t + max_new <= horizon``. When
admission stalls, the scheduler ROLLS the window (r5, VERDICT r4 item 5):
every live row's columns shift left by ``delta`` = the oldest live row's
start column (one whole-cache ``jnp.roll`` — about one decode step's
cache read, paid only at stalls), reclaiming every column before the
oldest live row. One long-running row therefore no longer starves queued
admissions — capacity degrades to the old all-done reset only when that
row was admitted at the very start of the window and is still live at
its end. The reset (t back to 0, one fresh window) remains as the cheap
path when NO rows are live.

Packed/fused-decode support: deliberately einsum-only, twice justified —
(a) the fused kernel's manual DMA has no per-row start mask (module
design note above), and (b) the r5 real-loop A/B measured the einsum
path FASTER than the packed kernel for int8 caches at every batch size
anyway (benchmarks/README.md r5 decode section), and int8 is the serving
perf mode. bf16-cache continuous serving would leave the kernel's +10%
on the table; measured, recorded, accepted.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mellow_tpu.models import generate as gen
from mellow_tpu.models import llama
from mellow_tpu.models.llama import KVCache


class ContinuousState(NamedTuple):
    """Slot-machine decode state. All arrays keep batch (= slots) leading
    (cache batch axis is 1), like DecodeState."""

    cache: KVCache
    tokens: jax.Array  # (B, horizon) int32, columns = global decode steps
    last_hidden: jax.Array  # (B, D)
    t: jax.Array  # scalar int32: global decode steps taken (multiple of W)
    start: jax.Array  # (B,) int32: cache column where the row's seq begins
    deadline: jax.Array  # (B,) int32: row is done once t reaches this
    done: jax.Array  # (B,) bool
    rng: jax.Array
    # Per-request sampling knobs (r5): read only when the scheduler was
    # built with per_request=True; neutral values otherwise.
    temp: jax.Array = None  # (B,) f32 temperature
    topp: jax.Array = None  # (B,) f32 nucleus top_p
    gmask: jax.Array = None  # (B,) bool: row decodes greedily


def empty_state(
    cfg, slots: int, prefix_len: int, horizon: int, *,
    cache_dtype: str = "float32", dtype=jnp.float32,
    rng: Optional[jax.Array] = None,
) -> ContinuousState:
    """All-idle state: every slot done, cache zeroed with ``length``
    already at ``prefix_len`` (the shared write frontier; the first
    admission inserts its prefill block at columns [0, P)). Idle slots
    attend only to their current token (their start mask excludes every
    cache column), which keeps their dead decode math finite."""
    cache = KVCache.create(
        cfg, slots, prefix_len + horizon, jnp.dtype(cache_dtype)
    )
    cache = cache._replace(length=jnp.asarray(prefix_len, jnp.int32))
    return ContinuousState(
        cache=cache,
        tokens=jnp.zeros((slots, horizon), jnp.int32),
        last_hidden=jnp.zeros((slots, cfg.hidden_size), dtype),
        t=jnp.zeros((), jnp.int32),
        start=jnp.full((slots,), prefix_len, jnp.int32),
        deadline=jnp.zeros((slots,), jnp.int32),
        done=jnp.ones((slots,), bool),
        rng=jax.random.PRNGKey(0) if rng is None else rng,
        temp=jnp.ones((slots,), jnp.float32),
        topp=jnp.ones((slots,), jnp.float32),
        gmask=jnp.ones((slots,), bool),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "prefill_chunk"))
def admit(
    params,
    cfg,
    state: ContinuousState,
    slot_idx: jax.Array,  # (J,) int32 — slots to fill (duplicates allowed
    # ONLY as padding that repeats entry 0, see ContinuousScheduler)
    prefix_embeds: jax.Array,  # (J, P, D)
    max_new: jax.Array,  # (J,) int32 per-request token budgets
    prefill_chunk: Optional[int] = None,
    knobs: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    # (temp, topp, gmask), each (J,) — per-request sampling (r5)
) -> Tuple[ContinuousState, jax.Array]:
    """Prefill ``prefix_embeds`` at LOCAL positions [0, P) and splice the
    resulting kv blocks into the admitted slots at global columns
    [c-P, c), c = cache.length. Returns (state, admit_step): the global
    decode-step column where these rows' tokens will begin (= state.t).

    The row insert is one gather + one scatter of (L, J, S_max, lanes) —
    J is small (an admission bucket), so this costs about J/B of a decode
    step's cache read. The prefill itself is the same price the
    batch-at-a-time engine pays per request; here it is paid once per
    request instead of once per BATCH SLOT-LIFETIME, which is the whole
    point."""
    J, P, _ = prefix_embeds.shape
    small = KVCache.create(cfg, J, P, state.cache.k.dtype)
    x_last, small = llama.prefill(
        params, cfg, prefix_embeds, small, chunk=prefill_chunk
    )
    c = state.cache.length
    col = c - P  # >= 0: c starts at P and only grows

    def splice(big, block):
        rows = big[:, slot_idx]  # (L, J, S_max, ...)
        at = (0, 0, col) + (0,) * (big.ndim - 3)
        rows = jax.lax.dynamic_update_slice(
            rows, block.astype(big.dtype), at
        )
        return big.at[:, slot_idx].set(rows)

    upd = {"k": splice(state.cache.k, small.k),
           "v": splice(state.cache.v, small.v)}
    if state.cache.quantized:
        upd["k_scale"] = splice(state.cache.k_scale, small.k_scale)
        upd["v_scale"] = splice(state.cache.v_scale, small.v_scale)
    new = state._replace(
        cache=state.cache._replace(**upd),
        last_hidden=state.last_hidden.at[slot_idx].set(
            x_last.astype(state.last_hidden.dtype)
        ),
        start=state.start.at[slot_idx].set(col),
        deadline=state.deadline.at[slot_idx].set(state.t + max_new),
        done=state.done.at[slot_idx].set(False),
    )
    if knobs is not None:
        temp, topp, gmask = knobs
        new = new._replace(
            temp=state.temp.at[slot_idx].set(temp),
            topp=state.topp.at[slot_idx].set(topp),
            gmask=state.gmask.at[slot_idx].set(gmask),
        )
    return new, state.t


@jax.jit
def roll_window(state: ContinuousState, delta: jax.Array) -> ContinuousState:
    """Reclaim the cache columns before the oldest live row (r5): shift
    every per-column buffer LEFT by ``delta`` (the oldest live row's start
    column, floored to a W multiple by the caller so ``t`` stays
    stage-aligned). ``jnp.roll`` wraps the reclaimed columns to the END of
    the buffer as garbage — columns >= the new write frontier, which every
    read masks by length/start before the softmax (finite values: they
    were written by this same program). Cost: one whole-cache read+write,
    about one decode step's cache stream, paid only at admission stalls.
    Done rows' start pins to the new frontier (attend-nothing, the
    empty_state convention); their deadlines may go negative, which keeps
    them done."""
    cache = state.cache
    upd = {"k": jnp.roll(cache.k, -delta, axis=2),
           "v": jnp.roll(cache.v, -delta, axis=2)}
    if cache.quantized:
        upd["k_scale"] = jnp.roll(cache.k_scale, -delta, axis=2)
        upd["v_scale"] = jnp.roll(cache.v_scale, -delta, axis=2)
    new_len = cache.length - delta
    return state._replace(
        cache=cache._replace(**upd, length=new_len),
        tokens=jnp.roll(state.tokens, -delta, axis=1),
        t=state.t - delta,
        start=jnp.where(
            state.done, new_len, jnp.maximum(state.start - delta, 0)
        ),
        deadline=state.deadline - delta,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "horizon", "stop_token_id", "greedy", "top_p", "temperature",
        "top_k", "W", "per_request",
    ),
)
def decode_stage(
    params,
    cfg,
    state: ContinuousState,
    stop_at_done: jax.Array,  # scalar int32: exit once this many slots are
    # done (traced — no recompile per threshold; B+1 = run to horizon)
    *,
    horizon: int,
    stop_token_id: int,
    greedy: bool = True,
    top_p: float = 0.8,
    temperature: float = 1.0,
    top_k: int = 0,
    W: int = 8,
    per_request: bool = False,
) -> ContinuousState:
    """The windowed decode while_loop over ragged slots: identical to
    ``generate``'s loop except (a) ``llama.decode_step`` runs with the
    per-row ``start`` (local RoPE + start mask), (b) rows also finish by
    per-row ``deadline``, and (c) the exit threshold is a traced done
    COUNT so the host can ask for "one more free slot" without a
    recompile. Repetition penalty is not supported here (slot token
    history crosses requests); the scheduler rejects it.

    ``per_request=True`` (r5): sampling knobs come from the state's
    (B,) ``temp``/``topp``/``gmask`` vectors instead of the static
    scalars — per-row temperature divides the logits, per-row top_p
    feeds the rejection sampler's acceptance test (static draw count =
    the _REJECT_MIN_TOP_P schedule, the worst supported knob), and
    greedy rows select their argmax. top_k is engine-wide either way
    (its kept-set rule needs the k-wide sort; per-row k would pay the
    widest row's sort for everyone — not worth it)."""
    dtype = state.last_hidden.dtype
    S_max = state.cache.k.shape[2]
    cos_np, sin_np = llama.rope_tables(cfg, S_max, dtype)
    cos_full, sin_full = jnp.asarray(cos_np), jnp.asarray(sin_np)
    embed_table = params["embed"]

    def body(s: ContinuousState):
        cache, tokens, hidden, done, rng = (
            s.cache, s.tokens, s.last_hidden, s.done, s.rng
        )
        pending = ()
        for i in range(W):
            logits = llama.logits_from_hidden(params, cfg, hidden)
            step_rng, rng = jax.random.split(rng)
            if per_request:
                lo = logits.astype(jnp.float32) / jnp.maximum(
                    s.temp[:, None], 1e-6
                )
                tok_s = gen._reject_sample(
                    lo, s.topp, step_rng,
                    draws=gen._reject_draws(gen._REJECT_MIN_TOP_P),
                )
                next_tok = jnp.where(
                    s.gmask, jnp.argmax(logits, axis=-1).astype(jnp.int32),
                    tok_s,
                )
            else:
                next_tok = gen._sample_token(
                    logits, greedy=greedy, top_p=top_p,
                    temperature=temperature, rng=step_rng, top_k=top_k,
                )
            tokens = jax.lax.dynamic_update_slice(
                tokens, next_tok[:, None], (0, s.t + i)
            )
            done = jnp.logical_or(
                jnp.logical_or(done, next_tok == stop_token_id),
                s.t + i + 1 >= s.deadline,
            )
            tok_embed = embed_table[next_tok].astype(dtype)
            hidden, cache, pending = llama.decode_step(
                params, cfg, tok_embed, cache, cos_full, sin_full, pending,
                start=s.start,
            )
        cache = llama.flush_pending(cfg, cache, pending)
        return s._replace(
            cache=cache, tokens=tokens, last_hidden=hidden, t=s.t + W,
            done=done, rng=rng,
        )

    def cond(s: ContinuousState):
        return jnp.logical_and(
            s.t < horizon, jnp.sum(s.done) < stop_at_done
        )

    return jax.lax.while_loop(cond, body, state)


class _Slot(NamedTuple):
    rid: int  # request id
    admit_step: int  # global decode-step column where its tokens begin
    # (shifts left with the window on roll_window)
    max_new: int


class ContinuousScheduler:
    """Host driver: a fixed bank of decode slots over ONE live device
    state; requests are admitted into freed slots at stage boundaries.

    Decoder-level (prefix embeds in, token lists out) and synchronous —
    the serving layer (serving.ContinuousBatchingEngine) wraps it with
    preprocessing/encode and a thread. Greedy rows are token-identical to
    solo ``generate`` runs (tests/test_continuous.py); sampled rows are
    valid draws but consume a shared key stream.
    """

    def __init__(
        self,
        params,
        cfg,  # LlamaConfig
        *,
        slots: int = 8,
        prefix_len: int,
        horizon: int = 256,
        cache_dtype: str = "float32",
        dtype=jnp.float32,
        stop_token_id: int,
        greedy: bool = True,
        top_p: float = 0.8,
        temperature: float = 1.0,
        top_k: int = 0,
        W: int = 8,
        rng: Optional[jax.Array] = None,
        prefill_chunk: Optional[int] = None,
        per_request: bool = False,  # per-request temperature/top_p/greedy
        admit_quantum: int = 1,  # exit a stage once this many MORE slots
        # are done (>1 batches admissions: fewer stage exits/host syncs
        # and fewer distinct pow-2 admit sizes -> fewer compiles; the
        # cost is freed slots idling up to quantum-1 drains longer)
    ):
        if horizon % W:
            raise ValueError(f"horizon {horizon} must be a multiple of W={W}")
        self.params, self.cfg = params, cfg
        self.slots, self.P, self.horizon = slots, prefix_len, horizon
        self.cache_dtype, self.dtype = cache_dtype, dtype
        self.stop_token_id = stop_token_id
        self.greedy, self.top_p = greedy, float(top_p)
        self.temperature, self.top_k, self.W = float(temperature), top_k, W
        self.prefill_chunk = prefill_chunk
        self.per_request = per_request
        self.admit_quantum = max(1, int(admit_quantum))
        if per_request and top_k:
            raise ValueError("per_request mode has no per-row top_k "
                             "(decode_stage docstring); set top_k=0")
        self._rng = rng
        self.state = empty_state(
            cfg, slots, prefix_len, horizon, cache_dtype=cache_dtype,
            dtype=dtype, rng=rng,
        )
        self._slot: List[Optional[_Slot]] = [None] * slots
        # queue items: (rid, prefix, max_new, (temp, topp, greedy))
        self._queue: List[Tuple[int, np.ndarray, int, Tuple[float, float, bool]]] = []
        self._next_rid = 0
        self._t = 0  # host mirror of state.t
        self._done_host = None  # host mirror of state.done (one fetch per
        # stage instead of three: each device_get pays a tunnel RTT)
        self.resets = 0  # capacity resets (observability)
        self.rolls = 0  # window rolls (observability)
        self._steps_rebased = 0  # steps absorbed by rolls/resets: keeps
        # ``clock`` (total decode steps executed) monotonic

    # -- request intake ------------------------------------------------

    def submit(
        self, prefix_embeds, max_new: int, *,
        temperature: Optional[float] = None, top_p: Optional[float] = None,
        greedy: Optional[bool] = None,
    ) -> int:
        """Queue one request; returns its request id. ``prefix_embeds``:
        (P, D) one row. The keyword knobs override the engine defaults for
        THIS request (requires per_request=True); top_p must stay >=
        generate._REJECT_MIN_TOP_P — the rejection sampler's static draw
        budget covers exactly that range (smaller values need the sort
        path, which a mixed batch would pay for every row)."""
        if max_new > self.horizon:
            raise ValueError(
                f"max_new {max_new} exceeds horizon {self.horizon}"
            )
        has_knobs = any(v is not None for v in (temperature, top_p, greedy))
        if has_knobs and not self.per_request:
            raise ValueError(
                "per-request sampling knobs need per_request=True"
            )
        g = self.greedy if greedy is None else bool(greedy)
        tp = self.top_p if top_p is None else float(top_p)
        tm = self.temperature if temperature is None else float(temperature)
        if self.per_request and not g and tp < gen._REJECT_MIN_TOP_P:
            raise ValueError(
                f"per-request top_p {tp} below the supported "
                f"{gen._REJECT_MIN_TOP_P} (submit docstring)"
            )
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append(
            (rid, np.asarray(prefix_embeds), int(max_new), (tm, tp, g))
        )
        return rid

    # -- internals -------------------------------------------------------

    def _admissible(self, max_new: int) -> bool:
        return self._t + max_new <= self.horizon

    def _admit_batch(self, free: List[int]) -> None:
        """Admit as many queued admissible requests as fit into ``free``
        slots, bucketing the count to a power of two (duplicate-padding
        with request 0's row so the scatter writes identical values —
        bounded compiles)."""
        take: List[Tuple[int, np.ndarray, int, Tuple[float, float, bool]]] = []
        rest: List[Tuple[int, np.ndarray, int, Tuple[float, float, bool]]] = []
        for item in self._queue:
            if len(take) < len(free) and self._admissible(item[2]):
                take.append(item)
            else:
                rest.append(item)
        if not take:
            return
        self._queue = rest
        J = 1 << int(np.ceil(np.log2(len(take))))
        pad = [take[i if i < len(take) else 0] for i in range(J)]
        idx = [free[i if i < len(take) else 0] for i in range(J)]
        prefixes = np.stack([p[1] for p in pad])
        budgets = np.asarray([p[2] for p in pad], np.int32)
        knobs = None
        if self.per_request:
            knobs = (
                jnp.asarray([p[3][0] for p in pad], jnp.float32),
                jnp.asarray([p[3][1] for p in pad], jnp.float32),
                jnp.asarray([p[3][2] for p in pad], bool),
            )
        self.state, admit_t = admit(
            self.params, self.cfg, self.state,
            jnp.asarray(idx, jnp.int32),
            jnp.asarray(prefixes, self.dtype),
            jnp.asarray(budgets),
            prefill_chunk=self.prefill_chunk,
            knobs=knobs,
        )
        t0 = int(admit_t)
        for n, (rid, _, max_new, _k) in enumerate(take):
            self._slot[free[n]] = _Slot(rid, t0, max_new)
            if self._done_host is not None:
                self._done_host[free[n]] = False

    def _collect(self, done_host, tokens_host, t_now: int):
        out = []
        for i in range(self.slots):
            s = self._slot[i]
            if s is None or not bool(done_host[i]):
                continue
            hi = min(s.admit_step + s.max_new, t_now)
            row = tokens_host[i, s.admit_step:hi]
            stop = np.nonzero(row == self.stop_token_id)[0]
            out.append((s.rid, row[: stop[0]].tolist() if len(stop) else row.tolist()))
            self._slot[i] = None
        return out

    def _reset(self) -> None:
        """Capacity reset: the [0, P + horizon) window is spent and every
        live row has finished — start a fresh window (one prefill per
        admitted request, the same price the batch-at-a-time engine pays
        every batch)."""
        self.state = empty_state(
            self.cfg, self.slots, self.P, self.horizon,
            cache_dtype=self.cache_dtype, dtype=self.dtype, rng=self._rng,
        )
        self._steps_rebased += self._t
        self._t = 0
        self._done_host = np.ones((self.slots,), bool)
        self.resets += 1

    # -- the drive loop --------------------------------------------------

    def _roll(self) -> bool:
        """Admission stalled on capacity with rows still live: reclaim
        the columns before the oldest live row by shifting the window
        left (roll_window). Returns True if any capacity was reclaimed."""
        live = [s for s in self._slot if s is not None]
        if not live:
            return False
        delta = (min(s.admit_step for s in live) // self.W) * self.W
        if delta <= 0:
            return False
        self.state = roll_window(self.state, jnp.asarray(delta, jnp.int32))
        self._t -= delta
        self._steps_rebased += delta
        self._slot = [
            None if s is None else s._replace(admit_step=s.admit_step - delta)
            for s in self._slot
        ]
        self.rolls += 1
        return True

    def step(self) -> List[Tuple[int, List[int]]]:
        """Admit what fits, run one stage, return finished
        (rid, token_list) pairs. Call until ``idle``."""
        # One done fetch per stage: the host mirror is refreshed at the
        # previous stage's exit and kept consistent through reset/admit
        # (every extra device_get pays a tunnel RTT on this rig).
        if self._done_host is None:
            self._done_host = np.asarray(jax.device_get(self.state.done)).copy()
        done_host = self._done_host
        active = any(s is not None for s in self._slot)
        if self._queue and not any(self._admissible(q[2]) for q in self._queue):
            if active:
                self._roll()  # rolling window: reclaim drained columns
            else:
                self._reset()
                done_host = self._done_host
        free = [
            i for i in range(self.slots)
            if bool(done_host[i]) and self._slot[i] is None
        ]
        if self._queue and free:
            self._admit_batch(free)  # updates the done mirror in place
        if all(s is None for s in self._slot):
            return []  # nothing live (queue may hold inadmissible items)
        # Exit target: one more row than currently-done when there is a
        # queue to admit from, else run until every live row finishes.
        n_done = int(self._done_host.sum())
        target = (n_done + self.admit_quantum if self._queue
                  else self.slots + 1)
        stop_at = jnp.asarray(min(target, self.slots + 1), jnp.int32)
        self.state = decode_stage(
            self.params, self.cfg, self.state, stop_at,
            horizon=self.horizon, stop_token_id=self.stop_token_id,
            greedy=self.greedy, top_p=self.top_p,
            temperature=self.temperature, top_k=self.top_k, W=self.W,
            per_request=self.per_request,
        )
        done_host, tokens_host, t_dev = jax.device_get(
            (self.state.done, self.state.tokens, self.state.t)
        )
        self._t = int(t_dev)
        self._done_host = np.asarray(done_host).copy()
        return self._collect(self._done_host, np.asarray(tokens_host), self._t)

    @property
    def clock(self) -> int:
        """Total decode steps executed (monotonic across rolls/resets) —
        the simulation clock for step-time workload drivers."""
        return self._t + self._steps_rebased

    @property
    def idle(self) -> bool:
        return not self._queue and all(s is None for s in self._slot)

    def run_to_completion(self) -> dict:
        """Drain queue + slots; returns {rid: token_list}."""
        results = {}
        while not self.idle:
            for rid, toks in self.step():
                results[rid] = toks
        return results
