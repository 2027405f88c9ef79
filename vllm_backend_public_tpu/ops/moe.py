"""Mixture-of-Experts compute: quantized expert matmuls + top-k dispatch.

The reference only passes `--quantization` through to vLLM
(reference: benchmark-vllm/vllm_templates.py:75-76); vLLM's native surface
is fused-MoE CUDA kernels. The TPU-native equivalents here:

- `expert_einsum`: dense all-experts matmul, QuantizedWeight-aware
  (int8/fp8 weight-only, w8a8, int4-group). Exact for any shapes; under an
  "expert"-sharded mesh this is also the simple EP layout (each device
  computes its local experts, XLA inserts the psum).
- top-k dispatch + grouped expert matmul: only the routed tokens compute.
  Tokens' (token, expert) assignments are sorted by expert into
  tile-aligned groups (static shapes — counts are data-dependent but the
  padded buffer is not), then a grouped matmul runs each m-tile against
  exactly one expert's weights:
    * Pallas kernel (`grouped_matmul`): the expert id of each m-tile comes
      from a scalar-prefetched tile→expert map, so weight tiles DMA
      straight from the [E, K, N] (possibly int8/fp8) array — dequant
      fused into the MXU feed, HBM traffic stays at the quantized width.
    * XLA fallback (`grouped_matmul_xla`): `lax.ragged_dot` over the same
      sorted layout (used on CPU and for cross-checking).
  FLOPs = top_k x tokens x 2HI (+ tile padding) instead of the dense
  path's num_experts x tokens x 2HI — a ~E/k saving (4x for Mixtral
  8x7B top-2).

Exactness: dispatch is capacity-free (a group's row budget is its actual
count rounded up to the tile), so no token is ever dropped and
grouped == dense bit-for-bit in fp32.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .linear import QuantizedWeight, is_quantized, quantize_activations
from .quant import unpack_int4


# --------------------------------------------------------------- dense path

def _dequant_full(w: QuantizedWeight, dtype) -> jax.Array:
    """Materialize a dequantized copy (XLA fuses the convert where it can;
    this is the correctness/fallback path, not the bandwidth-optimal one)."""
    if w.kind in ("int8", "fp8", "w8a8"):
        # q [.., K, N], s [.., N]
        return (w.q.astype(jnp.float32) * w.s[..., None, :]).astype(dtype)
    if w.kind == "int4":
        q = w.q
        k_packed = q.shape[-2]
        ng = w.s.shape[-2]
        if k_packed * 2 == ng * w.g:  # packed storage
            q = unpack_int4(q)
        *lead, k, n = q.shape
        qd = q.astype(jnp.float32).reshape(*lead, ng, w.g, n)
        qd = qd * w.s[..., :, None, :]
        return qd.reshape(*lead, k, n).astype(dtype)
    raise ValueError(w.kind)


def expert_einsum(spec: str, x: jax.Array, w) -> jax.Array:
    """einsum over stacked expert weights; w dense or QuantizedWeight.

    spec is an einsum like "bth,ehi->btei" (up/gate) or "btei,eih->bteh"
    (down). Weight-only schemes fuse the dequant into the contraction;
    w8a8 quantizes activations per row and runs int8 x int8 on the MXU.
    """
    if not is_quantized(w):
        return jnp.einsum(spec, x, w)
    if w.kind in ("int8", "fp8"):
        y = jnp.einsum(spec, x, w.q.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return (y * _out_scale(spec, w.s)).astype(x.dtype)
    if w.kind == "w8a8":
        x8, sx = quantize_activations(x)
        y = jnp.einsum(spec, x8, w.q, preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * _act_scale(spec, sx)
                * _out_scale(spec, w.s)).astype(x.dtype)
    if w.kind == "int4":
        return jnp.einsum(spec, x, _dequant_full(w, x.dtype))
    raise ValueError(w.kind)


def _out_scale(spec: str, s: jax.Array) -> jax.Array:
    """Broadcast per-out-channel scales to the einsum output layout."""
    out = spec.split("->")[1]
    # s covers the expert axis + the last output axis; insert singleton
    # dims for the remaining output axes (e.g. "btei": s [E, I] -> 1,1,E,I)
    w_axes = spec.split(",")[1].split("->")[0]
    s_axes = (w_axes[0], w_axes[-1])  # (expert, out_channel)
    shape = [s.shape[0] if a == s_axes[0]
             else (s.shape[1] if a == s_axes[1] else 1) for a in out]
    return s.reshape(shape)


def _act_scale(spec: str, sx: jax.Array) -> jax.Array:
    """Broadcast per-row activation scales [.., 1] to the output layout."""
    x_axes = spec.split(",")[0]
    out = spec.split("->")[1]
    shape = []
    for a in out:
        if a in x_axes[:-1]:
            shape.append(sx.shape[x_axes.index(a)])
        else:
            shape.append(1)
    return sx.reshape(shape)


# ----------------------------------------------------------- top-k dispatch

class DispatchPlan(NamedTuple):
    """Static-shaped routing plan for one MoE layer invocation.

    t_sorted:    [A] token index of each (token, expert) assignment,
                 sorted by expert (A = tokens * top_k)
    w_sorted:    [A] gate weight of each assignment, same order
    dest:        [A] destination row in the tile-aligned grouped buffer
    tile_expert: [num_m_tiles] expert id of each m-tile
    group_rows:  [E] rows (incl. padding) per expert, for ragged_dot
    m_pad:       static grouped-buffer height
    """

    t_sorted: jax.Array
    w_sorted: jax.Array
    dest: jax.Array
    tile_expert: jax.Array
    group_rows: jax.Array
    m_pad: int


def make_dispatch(topi: jax.Array, topw: jax.Array, num_experts: int,
                  tile: int, m_pad: Optional[int] = None) -> DispatchPlan:
    """Sort (token, expert) assignments into tile-aligned expert groups.

    topi/topw: [N, k]. Capacity-free: each expert's group is its actual
    assignment count rounded up to `tile`, so nothing is dropped. All
    shapes are static; only values are data-dependent (jit-safe).

    Expert-parallel use: assignments with topi >= num_experts are
    FOREIGN (owned by another expert shard) — they get dest == m_pad so
    the grouped-buffer scatter drops them, and w_sorted == 0 so the
    combine ignores the (clamped) gather. m_pad may then be capped at
    the local worst case N*min(k, num_experts) + num_experts*tile
    instead of the global A + E*tile.
    """
    n, k = topi.shape
    a = n * k
    e_a = topi.reshape(-1)
    t_a = jnp.arange(a, dtype=jnp.int32) // k
    w_a = topw.reshape(-1)
    order = jnp.argsort(e_a, stable=True)
    e_s = e_a[order]
    local = e_s < num_experts
    e_c = jnp.minimum(e_s, num_experts - 1)
    counts = jnp.zeros((num_experts,), jnp.int32).at[e_a].add(
        1, mode="drop")                                       # [E] local only
    padded = ((counts + tile - 1) // tile) * tile
    pstart = jnp.cumsum(padded) - padded                      # [E]
    start = jnp.cumsum(counts) - counts
    r = jnp.arange(a, dtype=jnp.int32)
    if m_pad is None:
        m_pad = a + num_experts * tile  # >= sum(padded), tile-aligned
    dest = jnp.where(local, pstart[e_c] + (r - start[e_c]),
                     m_pad).astype(jnp.int32)
    w_s = jnp.where(local, w_a[order], 0.0)
    num_tiles = m_pad // tile
    pend = pstart + padded
    tile_expert = jnp.searchsorted(
        pend, jnp.arange(num_tiles, dtype=jnp.int32) * tile, side="right")
    tile_expert = jnp.minimum(tile_expert, num_experts - 1).astype(jnp.int32)
    # absorb the trailing unused rows into the last group so ragged_dot's
    # group sizes sum to m_pad (those rows hold zeros; results unread)
    group_rows = padded.at[num_experts - 1].add(m_pad - jnp.sum(padded))
    return DispatchPlan(t_a[order].astype(jnp.int32), w_s, dest,
                        tile_expert, group_rows.astype(jnp.int32), m_pad)


def gather_tokens(x_flat: jax.Array, plan: DispatchPlan) -> jax.Array:
    """[N, H] tokens -> [m_pad, H] grouped rows (padding rows are zero)."""
    h = x_flat.shape[-1]
    out = jnp.zeros((plan.m_pad, h), x_flat.dtype)
    # foreign (expert-parallel) assignments carry dest == m_pad: dropped
    return out.at[plan.dest].set(x_flat[plan.t_sorted], mode="drop")


def combine_tokens(y_grouped: jax.Array, plan: DispatchPlan,
                   num_tokens: int) -> jax.Array:
    """[m_pad, H] expert outputs -> gate-weighted sum per token [N, H]."""
    rows = y_grouped[plan.dest] * plan.w_sorted[:, None].astype(
        y_grouped.dtype)
    out = jnp.zeros((num_tokens, y_grouped.shape[-1]), y_grouped.dtype)
    return out.at[plan.t_sorted].add(rows)


# ------------------------------------------------------- grouped matmul(s)

def grouped_matmul_xla(xg: jax.Array, w, group_rows: jax.Array) -> jax.Array:
    """ragged_dot over the sorted layout (CPU / cross-check path)."""
    wd = w if not is_quantized(w) else _dequant_full(w, xg.dtype)
    return jax.lax.ragged_dot(xg, wd.astype(xg.dtype), group_rows)


def _gmm_kernel(te_ref, x_ref, w_ref, s_ref, o_ref, *, kind: str):
    # s_ref holds ALL experts' scale rows for this n-tile ([E, tn]); the
    # kernel dynamically selects its expert's row. A per-expert block —
    # (1, tn), a squeezed dim, or a flat rank-1 [tn] view — either
    # violates Mosaic's last-two-dims (8, 128)-divisible-or-full rule
    # (E is small) or CRASHES the real-TPU compiler outright (rank-1
    # blocks; exit-code-1 with no diagnostics). Only real-TPU lowering
    # checks any of this — interpret mode accepted every form.
    sc = s_ref[te_ref[pl.program_id(0)]]
    x = x_ref[...]
    if kind == "w8a8":
        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        sx = jnp.maximum(amax / 127.0, 1e-8)
        x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot(x8, w_ref[0],
                        preferred_element_type=jnp.int32)
        o_ref[...] = (y.astype(jnp.float32) * sx * sc).astype(o_ref.dtype)
        return
    # bf16 feeds the MXU natively (f32 operands halve MXU rate and
    # double VREG pressure); accumulate f32
    wt = w_ref[0].astype(jnp.bfloat16)
    y = jax.lax.dot(x.astype(jnp.bfloat16), wt,
                    preferred_element_type=jnp.float32)
    o_ref[...] = (y * sc).astype(o_ref.dtype)


def _gmm_tile_m(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def grouped_matmul(xg: jax.Array, w: QuantizedWeight,
                   tile_expert: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """Pallas grouped matmul: row-tile i of xg multiplies expert
    tile_expert[i]'s [K, N] (quantized) weight; dequant fused in VMEM.

    xg: [M, K] with M % tile_m == 0 and every m-tile belonging to exactly
    one expert (make_dispatch guarantees this). w.q: [E, K, N] int8/fp8,
    w.s: [E, N]. Returns [M, N] in xg.dtype.
    """
    m, k = xg.shape
    e, _, n = w.q.shape
    tm = _gmm_tile_m(xg.dtype)
    # fat n-tiles: the per-(m-tile, n-tile) dot is latency-bound at
    # decode's skinny m (16 rows), so fewer, wider steps win (512-col
    # blocks stay ~1MB in VMEM at K=2048 int8). fp8 weight blocks wider
    # than 256 lanes crash the TPU compiler (exit-code-1, bisected on
    # v5e at (1, 5632, 512) float8_e4m3fn; int8 is fine at 512).
    tn_cap = 256 if w.q.dtype == jnp.float8_e4m3fn else 512
    tn = next((t for t in (512, 256, 128) if t <= tn_cap and n % t == 0),
              n)
    grid = (m // tm, n // tn)

    out = pl.pallas_call(
        functools.partial(_gmm_kernel, kind=w.kind),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tm, k), lambda i, j, te: (i, 0)),
                pl.BlockSpec((1, k, tn), lambda i, j, te: (te[i], 0, j)),
                # all experts' scale rows for this n-tile; the kernel
                # row-selects (see _gmm_kernel for why not (1, tn))
                pl.BlockSpec((e, tn), lambda i, j, te: (0, j)),
            ],
            out_specs=pl.BlockSpec((tm, tn), lambda i, j, te: (i, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), xg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(tile_expert, xg, w.q, w.s)
    return out


def _gmm_ok(w, n_tokens_axis_ok: bool = True) -> bool:
    if not is_quantized(w):
        return False
    # fp8 goes to XLA ragged_dot: in-kernel e4m3 conversion is
    # VPU-emulated on v5e (measured 46.6 vs 8.1 ms/step int8 on the
    # mixtral-arch bench) and fp8 weight blocks wider than 256 lanes
    # crash the TPU compiler; XLA's fused convert handles fp8 well
    if w.kind not in ("int8", "w8a8"):
        return False
    k, n = w.q.shape[-2:]
    return k % 128 == 0 and n % 128 == 0


def grouped_expert_matmul(xg: jax.Array, w, plan: DispatchPlan,
                          interpret: bool = False) -> jax.Array:
    """Route to the Pallas grouped kernel when eligible, else ragged_dot."""
    use_kernel = (_gmm_ok(w)
                  and (jax.default_backend() == "tpu" or interpret)
                  and xg.shape[0] % _gmm_tile_m(xg.dtype) == 0)
    if use_kernel:
        return grouped_matmul(xg, w, plan.tile_expert, interpret=interpret)
    return grouped_matmul_xla(xg, w, plan.group_rows)


# ------------------------------------------------------------ full MoE MLP

def moe_mlp_grouped(x: jax.Array, router_w, we_gate, we_up, we_down,
                    top_k: int, interpret: bool = False) -> jax.Array:
    """Sparse MoE MLP: route -> dispatch -> grouped silu-MLP -> combine.

    x: [B, T, H]. Only the top_k routed experts compute per token.
    Exact (capacity-free) — matches moe_mlp_dense bit-for-bit in fp32.
    """
    b, t, h = x.shape
    n = b * t
    xf = x.reshape(n, h)
    e = (we_gate.q if is_quantized(we_gate) else we_gate).shape[0]
    logits = xf.astype(jnp.float32) @ router_w.astype(jnp.float32)  # [N, E]
    topv, topi = jax.lax.top_k(logits, top_k)
    topw = jax.nn.softmax(topv, axis=-1)

    tile = _gmm_tile_m(x.dtype)
    plan = make_dispatch(topi, topw, e, tile)
    xg = gather_tokens(xf, plan)                       # [M, H]
    g = grouped_expert_matmul(xg, we_gate, plan, interpret)
    u = grouped_expert_matmul(xg, we_up, plan, interpret)
    hg = (jax.nn.silu(g.astype(jnp.float32))
          * u.astype(jnp.float32)).astype(x.dtype)     # [M, I]
    y = grouped_expert_matmul(hg, we_down, plan, interpret)  # [M, H]
    return combine_tokens(y, plan, n).reshape(b, t, h).astype(x.dtype)


def _weight_shard_spec(w, qspec):
    """shard_map spec pytree for a dense array or QuantizedWeight.

    Mirrors parallel/sharding.py:_shard_one: per-out-channel scales drop
    the input axis; int4 group scales keep full rank.
    """
    from jax.sharding import PartitionSpec as P

    if not is_quantized(w):
        return qspec
    if w.s.ndim == w.q.ndim:
        s_spec = qspec
    else:
        s_spec = P(*qspec[:-2], qspec[-1])
    return QuantizedWeight(w.kind, qspec, s_spec, w.g)


def moe_mlp_grouped_sharded(x: jax.Array, router_w, we_gate, we_up, we_down,
                            top_k: int, mesh,
                            interpret: bool = False) -> jax.Array:
    """Expert-parallel grouped MoE: shard_map over ("expert", "model").

    Each expert shard keeps ONLY its local experts' weights ([E/ep, H,
    I/tp] — "expert" on the expert axis, "model" on the MLP width, the
    same specs GSPMD uses for the dense path) and computes ONLY the
    (token, expert) assignments routed to its local experts: routing is
    recomputed per shard (replicated router — cheap), foreign
    assignments are dropped at the dispatch scatter, and the grouped
    buffer is capped at the local worst case N*min(k, E_local) rows.
    A psum over ("expert", "model") combines expert contributions and
    the down-projection's partial sums in one collective. Tokens stay
    sharded over "data"; nothing is ever gathered to one device.

    Capacity-free and exact: no token is dropped whatever the routing
    imbalance (the buffer bound is the worst case, not an average-case
    capacity factor), so grouped-EP == dense-EP.

    This is the TPU-native answer to vLLM's fused-MoE + all-to-all EP
    (reference passthrough: --quantization / EP implied by BASELINE
    config #5; reference benchmark-vllm/vllm_templates.py:75-76):
    with activations replicated over "expert", token exchange is a
    masked scatter + psum instead of an explicit all-to-all.
    """
    from jax.sharding import PartitionSpec as P

    xs = P("data", None, None)

    def inner(xl, rw, wg, wu, wd):
        e_loc = (wg.q if is_quantized(wg) else wg).shape[0]
        ep = jax.lax.axis_size("expert")
        lo = jax.lax.axis_index("expert") * e_loc
        b, t, h = xl.shape
        n = b * t
        xf = xl.reshape(n, h)
        logits = xf.astype(jnp.float32) @ rw.astype(jnp.float32)
        topv, topi = jax.lax.top_k(logits, top_k)
        topw = jax.nn.softmax(topv, axis=-1)
        # local expert ids; foreign assignments map past e_loc => dropped
        topi_l = jnp.where((topi >= lo) & (topi < lo + e_loc),
                           topi - lo, e_loc)
        tile = _gmm_tile_m(xl.dtype)
        m_cap = n * min(top_k, e_loc) + e_loc * tile
        m_cap = min(m_cap, n * top_k + e_loc * tile)
        plan = make_dispatch(topi_l, topw, e_loc, tile, m_pad=m_cap)
        xg = gather_tokens(xf, plan)
        g = grouped_expert_matmul(xg, wg, plan, interpret)
        u = grouped_expert_matmul(xg, wu, plan, interpret)
        hg = (jax.nn.silu(g.astype(jnp.float32))
              * u.astype(jnp.float32)).astype(xl.dtype)
        y = grouped_expert_matmul(hg, wd, plan, interpret)
        out = combine_tokens(y, plan, n).reshape(b, t, h)
        if ep > 1 or jax.lax.axis_size("model") > 1:
            out = jax.lax.psum(out, ("expert", "model"))
        return out.astype(xl.dtype)

    in_specs = (xs, P(None, None),
                _weight_shard_spec(we_gate, P("expert", None, "model")),
                _weight_shard_spec(we_up, P("expert", None, "model")),
                _weight_shard_spec(we_down, P("expert", "model", None)))
    return jax.shard_map(inner, mesh=mesh, in_specs=in_specs,
                         out_specs=xs, check_vma=False)(
        x, router_w, we_gate, we_up, we_down)


def _ragged_a2a(operand, output, in_off, send_sizes, out_off, recv_sizes,
                axis: str):
    """jax.lax.ragged_all_to_all, with an emulation off-TPU.

    XLA:CPU has no `ragged-all-to-all` thunk (UNIMPLEMENTED as of JAX
    0.9), so the 8-device virtual-CPU test mesh and the multichip
    dryrun emulate it: all_gather every shard's operand and offset
    vectors, then each shard reconstructs its output rows by index
    arithmetic. Bytes don't scale on the emulation path (it's an
    all_gather) — it exists for correctness coverage only; real TPU
    meshes lower to the native collective, whose ICI bytes are the
    actual routed rows.

    Semantics (both paths): device s sends
    operand[in_off[d] : in_off[d]+send_sizes[d]] to device d, landing at
    output[out_off_of_s_at_d : + send_sizes[d]]; `out_off` holds, per
    destination d, the offset in d's output where THIS device's chunk
    lands; `recv_sizes[s]` = rows this device receives from s. Rows of
    `output` nobody writes keep their initial value.
    """
    if jax.default_backend() == "tpu":
        return jax.lax.ragged_all_to_all(
            operand, output, in_off, send_sizes, out_off, recv_sizes,
            axis_name=axis)
    me = jax.lax.axis_index(axis)
    all_ops = jax.lax.all_gather(operand, axis)        # [ep, A, ...]
    src_in = jax.lax.all_gather(in_off, axis)          # [ep, ep]
    dst_out = jax.lax.all_gather(out_off, axis)        # [ep, ep]
    cap = output.shape[0]
    r = jnp.arange(cap, dtype=jnp.int32)
    start = dst_out[:, me]                             # [ep] chunk starts
    cond = ((r[None, :] >= start[:, None])
            & (r[None, :] < (start + recv_sizes)[:, None]))  # [ep, cap]
    src_dev = jnp.argmax(cond, axis=0).astype(jnp.int32)
    written = jnp.any(cond, axis=0)
    src_row = src_in[src_dev, me] + (r - start[src_dev])
    gathered = all_ops[src_dev, jnp.clip(src_row, 0, all_ops.shape[1] - 1)]
    mask = written.reshape(written.shape + (1,) * (output.ndim - 1))
    return jnp.where(mask, gathered, output)


def moe_mlp_a2a_sharded(x: jax.Array, router_w, we_gate, we_up, we_down,
                        top_k: int, mesh,
                        interpret: bool = False) -> jax.Array:
    """Expert-parallel MoE with a RAGGED ALL-TO-ALL token exchange.

    The round-3 path (moe_mlp_grouped_sharded) replicates activations
    over "expert" and combines with a psum: per-shard routing work and
    the combine collective scale with the FULL token set — O(E) more
    ICI bytes than necessary at Mixtral-scale EP. Here tokens are
    SHARDED over "expert" inside the region (each shard slices its
    n/ep rows of the replicated input — free), routing runs on n/ep
    tokens, and only ROUTED TOKEN ROWS cross the interconnect:

      1. sort my assignments by destination shard (dst = expert // E_loc)
      2. exchange per-(src, dst) counts (an all_gather of [ep] ints)
      3. jax.lax.ragged_all_to_all ships the token rows (+ an int32
         row of local-expert ids) — bytes/step = actual routed rows
      4. each shard groups its received rows by local expert
         (make_dispatch with k=1) and runs the grouped quantized MLP
      5. a reverse ragged_all_to_all returns computed rows to the
         token-owning shard, which applies the top-k gate weights
      6. all_gather over "expert" restores the caller's
         replicated-over-"expert" activation contract

    ICI bytes per shard per layer (H=hidden, n=tokens, k=top_k):
      psum path:  ~2 * n * H          (reduce-scatter + all-gather)
      this path:  ~2 * n * k * H / ep (dispatch + return)
                  + n * H * (ep-1)/ep (final all-gather)
    At ep = 2, k = 2 they break even (~2nH vs ~2.5nH — the a2a only
    pays off with routing locality); at ep = 8, k = 2 the a2a moves
    ~1.4nH vs ~1.75nH and routing/dispatch compute drops 8x. The
    crossover is why the engine keeps the psum path for ep <= 2.

    Capacity-free and exact like the psum path: receive buffers are
    worst-case-sized (every token routes to me), never dropped.
    Reference touchpoint: vLLM's all-to-all EP dispatch
    (benchmark-vllm/vllm_templates.py:75-76 passes EP through).
    """
    from jax.sharding import PartitionSpec as P

    xs = P("data", None, None)

    def inner(xl, rw, wg, wu, wd):
        e_loc = (wg.q if is_quantized(wg) else wg).shape[0]
        ep = jax.lax.axis_size("expert")
        me = jax.lax.axis_index("expert")
        b, t, h = xl.shape
        n = b * t
        tile = _gmm_tile_m(xl.dtype)
        xf = xl.reshape(n, h)
        if ep == 1:
            # no expert axis: plain local grouped MoE (+ "model" psum)
            logits = xf.astype(jnp.float32) @ rw.astype(jnp.float32)
            topv, topi = jax.lax.top_k(logits, top_k)
            topw = jax.nn.softmax(topv, axis=-1)
            plan = make_dispatch(topi, topw, e_loc, tile)
            xg = gather_tokens(xf, plan)
            g = grouped_expert_matmul(xg, wg, plan, interpret)
            u = grouped_expert_matmul(xg, wu, plan, interpret)
            hg = (jax.nn.silu(g.astype(jnp.float32))
                  * u.astype(jnp.float32)).astype(xl.dtype)
            y = grouped_expert_matmul(hg, wd, plan, interpret)
            out = combine_tokens(y, plan, n)
            if jax.lax.axis_size("model") > 1:
                out = jax.lax.psum(out, "model")
            return out.reshape(b, t, h).astype(xl.dtype)

        # ---- 1. my token slice (input is replicated over "expert") ----
        n_pad = -(-n // ep) * ep
        if n_pad != n:
            xf = jnp.pad(xf, ((0, n_pad - n), (0, 0)))
        n_loc = n_pad // ep
        xme = jax.lax.dynamic_slice_in_dim(xf, me * n_loc, n_loc, 0)

        # ---- 2. route my tokens only ---------------------------------
        logits = xme.astype(jnp.float32) @ rw.astype(jnp.float32)
        topv, topi = jax.lax.top_k(logits, top_k)      # [n_loc, k]
        topw = jax.nn.softmax(topv, axis=-1)
        a = n_loc * top_k
        flat_e = topi.reshape(-1)                       # [a] global expert
        dst = flat_e // e_loc                           # [a] target shard
        tok = jnp.arange(a, dtype=jnp.int32) // top_k
        order = jnp.argsort(dst, stable=True)
        send_rows = xme[tok[order]]                     # [a, H]
        send_eid = (flat_e % e_loc)[order].astype(jnp.int32)

        # ---- 3. count exchange + ragged all-to-all -------------------
        cnt = jnp.zeros((ep,), jnp.int32).at[dst].add(1)
        in_off = (jnp.cumsum(cnt) - cnt).astype(jnp.int32)
        cnt_mat = jax.lax.all_gather(cnt, "expert")     # [ep(src), ep(dst)]
        recv_sizes = cnt_mat[:, me].astype(jnp.int32)   # from each src
        # where my chunk lands at dst d: after every source s < me
        out_off = ((jnp.cumsum(cnt_mat, axis=0)
                    - cnt_mat)[me]).astype(jnp.int32)
        cap = -(-(n_pad * min(top_k, e_loc)) // tile) * tile
        recv = _ragged_a2a(
            send_rows, jnp.zeros((cap, h), send_rows.dtype),
            in_off, cnt, out_off, recv_sizes, "expert")
        # expert ids ride a second (tiny) ragged exchange; unwritten
        # rows keep the e_loc init = the FOREIGN marker make_dispatch
        # drops, so garbage rows can never select expert 0
        eid = _ragged_a2a(
            send_eid, jnp.full((cap,), e_loc, jnp.int32),
            in_off, cnt, out_off, recv_sizes, "expert")

        # ---- 4. grouped MLP over received rows -----------------------
        plan = make_dispatch(eid[:, None],
                             jnp.ones((cap, 1), jnp.float32),
                             e_loc, tile, m_pad=cap + e_loc * tile)
        xg = gather_tokens(recv, plan)
        g = grouped_expert_matmul(xg, wg, plan, interpret)
        u = grouped_expert_matmul(xg, wu, plan, interpret)
        hg = (jax.nn.silu(g.astype(jnp.float32))
              * u.astype(jnp.float32)).astype(xl.dtype)
        y = grouped_expert_matmul(hg, wd, plan, interpret)
        y_rows = combine_tokens(y, plan, cap)           # received order

        # ---- 5. return rows to their owners --------------------------
        rev_in_off = (jnp.cumsum(recv_sizes)
                      - recv_sizes).astype(jnp.int32)
        # my returned chunk lands where source s originally packed its
        # dst=me chunk: after s's chunks for every dst d < me
        rev_out_off = ((jnp.cumsum(cnt_mat, axis=1)
                        - cnt_mat)[:, me]).astype(jnp.int32)
        back = _ragged_a2a(
            y_rows, jnp.zeros((a, h), y_rows.dtype),
            rev_in_off, recv_sizes, rev_out_off, cnt,
            "expert")                                   # my sorted order

        # ---- 6. gate-weighted combine + restore replication ----------
        w_s = topw.reshape(-1)[order].astype(jnp.float32)
        y_tok = jnp.zeros((n_loc, h), jnp.float32).at[tok[order]].add(
            back.astype(jnp.float32) * w_s[:, None])
        if jax.lax.axis_size("model") > 1:
            # down-projection partial sums over the sharded I axis
            y_tok = jax.lax.psum(y_tok, "model")
        out = jax.lax.all_gather(y_tok.astype(xl.dtype), "expert",
                                 axis=0, tiled=True)    # [n_pad, H]
        return out[:n].reshape(b, t, h)

    in_specs = (xs, P(None, None),
                _weight_shard_spec(we_gate, P("expert", None, "model")),
                _weight_shard_spec(we_up, P("expert", None, "model")),
                _weight_shard_spec(we_down, P("expert", "model", None)))
    return jax.shard_map(inner, mesh=mesh, in_specs=in_specs,
                         out_specs=xs, check_vma=False)(
        x, router_w, we_gate, we_up, we_down)


def moe_mlp_dense(x: jax.Array, router_w, we_gate, we_up, we_down,
                  top_k: int) -> jax.Array:
    """All-experts compute with gates zeroed for unrouted experts. Exact;
    shardable over an "expert" mesh axis (GSPMD inserts the psum)."""
    b, t, h = x.shape
    e = (we_gate.q if is_quantized(we_gate) else we_gate).shape[0]
    logits = (x.astype(jnp.float32)
              @ router_w.astype(jnp.float32))          # [B, T, E]
    topv, topi = jax.lax.top_k(logits, top_k)
    topw = jax.nn.softmax(topv, axis=-1)
    gates = jnp.zeros_like(logits).at[
        jnp.arange(b)[:, None, None],
        jnp.arange(t)[None, :, None],
        topi].set(topw)                                # [B, T, E]

    ge = expert_einsum("bth,ehi->btei", x, we_gate)
    ue = expert_einsum("bth,ehi->btei", x, we_up)
    he = (jax.nn.silu(ge.astype(jnp.float32))
          * ue.astype(jnp.float32)).astype(x.dtype)
    ye = expert_einsum("btei,eih->bteh", he, we_down)
    return jnp.einsum("bteh,bte->bth", ye, gates.astype(x.dtype))
