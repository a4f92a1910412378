"""Zerocheck: per-chip constraint sumcheck, TPU-native.

For each chip, the polynomial over the max_log_row_count trace variables

  Z(x) = eq(zeta, x) * [ C_alpha(x) - adj * geq(h, x)
                         + sum_k gkrc^(k+1) * trace_k(x) ]

is sumchecked (degree 4 = MAX_CONSTRAINT_DEGREE + 1), batched across
chips with lambda (reference: crates/hypercube/src/prover/shard.rs:474
`zerocheck`, crates/hypercube/src/prover/zerocheck/). Here
  * zeta = the LogUp GKR output point; the claims are the gkrc-batched
    GKR trace openings,
  * C_alpha = Horner-in-alpha accumulation of the chip constraints,
  * adj = the constraints evaluated on the all-zero row ("padded row
    adjustment") and geq the [row >= height] indicator MLE, cancelling
    the padded region's contribution,
  * the trailing sum ties the same trace columns opened by the GKR proof
    to the zerocheck's final evaluation point.

Device work: one fused kernel per chip per round computes the 5
restricted-sum evaluations (X = 0..4) — the chip constraint function is
traced by JAX and fused by XLA over all rows (no bytecode interpreter,
unlike the reference GPU's zerocheck kernels).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..air import tape as air_tape
from ..air.builder import ConstraintFolder, JnpOps, NpOps
from ..field import extension as ext
from ..field import koalabear as kb
from ..iop import sumcheck as sc
from ..ops import hostmle
from ..ops import mle as mle_ops
from ..ops.hostmle import HOST_THRESH, NpVecOps

E4 = ext.npext4

MAX_CONSTRAINT_DEGREE = 3


def _to_monty_np(x):
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


def _from_monty_np(x):
    return np.asarray(kb.from_monty(jnp.asarray(x)), np.uint32)


_VINV_CACHE = {}


def interp_coeffs(ys: list) -> np.ndarray:
    """Coefficient form of the degree-(n-1) poly through ((0..n-1), ys)."""
    n = len(ys)
    if n not in _VINV_CACHE:
        m = [[pow(x, k, kb.P) for k in range(n)] for x in range(n)]
        inv = [[1 if i == j else 0 for j in range(n)] for i in range(n)]
        for col in range(n):
            piv = next(r for r in range(col, n) if m[r][col] % kb.P != 0)
            m[col], m[piv] = m[piv], m[col]
            inv[col], inv[piv] = inv[piv], inv[col]
            pinv = pow(m[col][col], kb.P - 2, kb.P)
            m[col] = [v * pinv % kb.P for v in m[col]]
            inv[col] = [v * pinv % kb.P for v in inv[col]]
            for r in range(n):
                if r != col and m[r][col] % kb.P:
                    f = m[r][col] % kb.P
                    m[r] = [(a - f * b) % kb.P for a, b in zip(m[r], m[col])]
                    inv[r] = [(a - f * b) % kb.P for a, b in zip(inv[r], inv[col])]
        _VINV_CACHE[n] = np.array(inv, np.uint32)
    vinv = _VINV_CACHE[n]
    coeffs = []
    for k in range(n):
        acc = np.zeros(4, np.uint32)
        for x in range(n):
            acc = E4.add(acc, kb.npf.mul(np.asarray(ys[x], np.uint32), vinv[k][x]))
        coeffs.append(acc)
    return np.stack(coeffs)


def _pv_host(public_values) -> list:
    out = []
    for v in public_values:
        if isinstance(v, np.ndarray) and v.shape == (4,):
            out.append(np.asarray(v, np.uint32))
        else:
            out.append(NpOps.const(int(v)))
    return out


def eval_constraints_host(chip, prep_row, main_row, public_values, alpha):
    """Single-row constraint accumulation (canonical, for the verifier).

    Reference: crates/hypercube/src/verifier/shard.rs:237 eval_constraints.
    """
    ops = NpOps()
    folder = ConstraintFolder(
        ops, prep_row, main_row, _pv_host(public_values), alpha
    )
    chip.eval(folder)
    return folder.accumulator


def padded_row_adjustment_host(chip, public_values, alpha):
    ops = NpOps()
    zero_prep = [ops.zero()] * chip.preprocessed_width
    zero_main = [ops.zero()] * chip.width
    folder = ConstraintFolder(
        ops, zero_prep, zero_main, _pv_host(public_values), alpha
    )
    chip.eval(folder)
    return folder.accumulator


def _make_round_kernel(chip, num_points: int):
    """Build (and memoize on the chip) the jit kernel computing the
    restricted sums for one chip. Memoization keeps one traced function
    per chip across prove calls so jax's in-process jit cache is hit on
    every round/shard after the first."""
    attr = f"_zc_round_kernel_{num_points}"
    cached = getattr(chip, attr, None)
    if cached is not None:
        return cached

    @partial(jax.jit, static_argnums=())
    def kernel(eq, geq, main, prep, alpha_m, adj_m, gkr_powers_m, pv_m):
        # tables: eq (2m,4), geq (2m,4), main (2m, W, 4), prep (2m, Wp, 4)
        outs = []
        eqv = eq.reshape(-1, 2, 4)
        geqv = geq.reshape(-1, 2, 4)
        mainv = main.reshape(main.shape[0] // 2, 2, main.shape[1], 4)
        prepv = (
            prep.reshape(prep.shape[0] // 2, 2, prep.shape[1], 4)
            if prep.shape[1]
            else None
        )
        m = eqv.shape[0]
        for x in range(num_points):
            def at_x(t):
                lo, hi = t[:, 0], t[:, 1]
                if x == 0:
                    return lo
                if x == 1:
                    return hi
                diff = kb.sub(hi, lo)
                v = hi
                for _ in range(x - 1):
                    v = kb.add(v, diff)
                return v

            eq_x = at_x(eqv)
            geq_x = at_x(geqv)
            main_x = at_x(mainv)  # (m, W, 4)
            prep_x = at_x(prepv) if prepv is not None else None
            ops = JnpOps(m)
            main_cols = [main_x[:, i] for i in range(main_x.shape[1])]
            prep_cols = (
                [prep_x[:, i] for i in range(prep_x.shape[1])]
                if prep_x is not None
                else []
            )
            alpha_b = jnp.broadcast_to(alpha_m, (m, 4))
            pv_vals = [
                jnp.broadcast_to(pv_m[i], (m, 4)) for i in range(pv_m.shape[0])
            ]
            folder = ConstraintFolder(ops, prep_cols, main_cols, pv_vals, alpha_b)
            chip.eval(folder)
            constr = folder.accumulator
            # padded-row adjustment
            constr = ext.ext4_sub(
                constr, ext.ext4_mul(geq_x, jnp.broadcast_to(adj_m, (m, 4)))
            )
            # gkr openings batch: main then preprocessed, powers skip(1)
            batch = jnp.zeros((m, 4), jnp.uint32)
            for k, col in enumerate(main_cols + prep_cols):
                batch = ext.ext4_add(
                    batch,
                    ext.ext4_mul(col, jnp.broadcast_to(gkr_powers_m[k], (m, 4))),
                )
            total = ext.ext4_mul(eq_x, ext.ext4_add(constr, batch))
            outs.append(mle_ops._sum_ext_axis0(total))
        return outs

    try:
        setattr(chip, attr, kernel)
    except AttributeError:
        pass  # chips with __slots__ just skip memoization
    return kernel


@jax.jit
def _build_tables_kernel(main_trace, prep_trace, zeta_m, geq_mask):
    """eq/geq/ext-embedded trace tables in one compile per shape."""
    n = main_trace.shape[0]
    eq = mle_ops.partial_lagrange_ext(zeta_m)
    one = np.zeros(4, np.uint32)
    one[0] = kb.to_monty_i(1)
    geq = jnp.where(
        geq_mask[:, None],
        jnp.broadcast_to(jnp.asarray(one), (n, 4)),
        jnp.zeros((n, 4), jnp.uint32),
    )
    main_e = jnp.stack(
        [mle_ops.ext4_embed(main_trace[:, i]) for i in range(main_trace.shape[1])],
        axis=1,
    ) if main_trace.shape[1] else jnp.zeros((n, 0, 4), jnp.uint32)
    prep_e = jnp.stack(
        [mle_ops.ext4_embed(prep_trace[:, i]) for i in range(prep_trace.shape[1])],
        axis=1,
    ) if prep_trace.shape[1] else jnp.zeros((n, 0, 4), jnp.uint32)
    return eq, geq, main_e, prep_e


@jax.jit
def _fix_last_tables(eq, geq, main, prep, alpha):
    out = []
    for t in (eq, geq):
        out.append(mle_ops.fix_last_variable_ext(t, alpha))
    for t in (main, prep):
        v = t.reshape((t.shape[0] // 2, 2) + t.shape[1:])
        lo, hi = v[:, 0], v[:, 1]
        diff = ext.ext4_sub(hi, lo)
        out.append(
            ext.ext4_add(lo, ext.ext4_mul(diff, jnp.broadcast_to(alpha, diff.shape)))
        )
    return tuple(out)


# ---------------------------------------------------------------------------
# Device path: tape-interpreter kernels
# ---------------------------------------------------------------------------
#
# The chip constraint tape (air/tape.py) is executed on device as a
# register-file interpreter: one fancy-indexed vector op per (level,
# opcode) group instead of one XLA node per expression. This keeps the
# HLO size proportional to the tape's LEVEL count (~40-65 groups/chip)
# rather than its node count (up to ~3.6k ops x ~100 HLO each fully
# inlined — which OOM-killed the TPU compiler at mlrc=16). The five
# X-point restrictions are stacked along the row axis (one tape pass,
# not five), and rows are processed in fixed blocks under lax.fori_loop
# so the register file stays bounded. Analog of the reference GPU's
# constraint-bytecode interpreter (sp1-gpu/crates/air/src/ir/).


def _tree_sum_mod(x):
    """Field-sum along axis 0 of a monty array (device)."""
    while x.shape[0] > 1:
        m = x.shape[0]
        if m % 2 == 1:
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            m += 1
        x = kb.add(x[: m // 2], x[m // 2:])
    return x[0]


def _make_local_sums_fn(chip, num_points: int):
    """Shape-generic restricted-sums body over a packed-table row block.

    Returns local_sums(table, n_pairs_live, apow_m, gkr_powers_m, adj_m,
    pv_m) -> (num_points, 4) monty — jittable; also the building block of
    the shard_map'd multi-device kernel (each device runs it on its row
    block and the partials reduce with a modular allreduce).
    """
    attr = f"_zc_local_sums_{num_points}"
    cached = getattr(chip, attr, None)
    if cached is not None:
        return cached
    tape = air_tape.trace_chip_tape(chip)
    wm, wp = chip.width, chip.preprocessed_width
    const_m = jnp.asarray(_to_monty_np(tape.const_vals % kb.P))
    const_m4 = jnp.stack(
        [const_m, jnp.zeros_like(const_m), jnp.zeros_like(const_m),
         jnp.zeros_like(const_m)], axis=-1,
    ) if tape.const_vals.size else jnp.zeros((0, 4), jnp.uint32)

    # tape executor closure with the prep offset fixed
    def tape_exec(flat, pv_m, apow_m):
        N = flat.shape[0]
        n_regs = max(tape.n_regs, 1)
        regs = jnp.zeros((n_regs, N, 4), jnp.uint32)
        if tape.main_regs.size:
            regs = regs.at[tape.main_regs].set(
                flat[:, tape.main_cols].transpose(1, 0, 2)
            )
        if tape.prep_regs.size:
            regs = regs.at[tape.prep_regs].set(
                flat[:, tape.prep_cols + wm].transpose(1, 0, 2)
            )
        if tape.pv_regs.size:
            pv_sel = pv_m[np.asarray(tape.pv_idx)]
            regs = regs.at[tape.pv_regs].set(
                jnp.broadcast_to(pv_sel[:, None, :], (len(tape.pv_idx), N, 4))
            )
        if tape.const_regs.size:
            regs = regs.at[tape.const_regs].set(
                jnp.broadcast_to(const_m4[:, None, :], (len(tape.const_regs), N, 4))
            )
        acc = jnp.zeros((N, 4), jnp.uint32)
        for op, dst, a, b in tape.levels:
            if op == air_tape.OP_ADD:
                regs = regs.at[dst].set(kb.add(regs[a], regs[b]))
            elif op == air_tape.OP_SUB:
                regs = regs.at[dst].set(kb.sub(regs[a], regs[b]))
            elif op == air_tape.OP_MUL:
                regs = regs.at[dst].set(ext.ext4_mul(regs[a], regs[b]))
            elif op == air_tape.OP_NEG:
                regs = regs.at[dst].set(kb.sub(jnp.zeros_like(regs[a]), regs[a]))
            elif op == air_tape.OP_SCALE:
                w = jnp.asarray(_to_monty_np(b % kb.P), jnp.uint32)
                regs = regs.at[dst].set(kb.mul(regs[a], w[:, None, None]))
            else:  # OP_OUT
                terms = ext.ext4_mul(regs[a], apow_m[np.asarray(dst)][:, None, :])
                acc = kb.add(acc, terms[0] if terms.shape[0] == 1 else _tree_sum_mod(terms))
        return acc

    def local_sums(table, n_pairs_live, apow_m, gkr_powers_m, adj_m, pv_m):
        # table: (n, Wt, 4) monty with Wt = wm + wp + 2 (eq, geq last)
        n, wt = table.shape[0], table.shape[1]
        n2 = n // 2
        blk = min(2048, n2)
        n_blocks = n2 // blk
        pairs = table.reshape(n2, 2, wt, 4)

        def body(i, sums):
            p = jax.lax.dynamic_slice(pairs, (i * blk, 0, 0, 0), (blk, 2, wt, 4))
            lo, hi = p[:, 0], p[:, 1]
            diff = kb.sub(hi, lo)
            xs = [lo, hi]
            cur = hi
            for _ in range(num_points - 2):
                cur = kb.add(cur, diff)
                xs.append(cur)
            flat = jnp.stack(xs).reshape(num_points * blk, wt, 4)
            constr = tape_exec(flat[:, : wm + wp], pv_m, apow_m)
            eq_x = flat[:, wm + wp + 0]
            geq_x = flat[:, wm + wp + 1]
            # gkrc column batching, one vectorized mul + log-depth reduce
            terms = ext.ext4_mul(flat[:, : wm + wp], gkr_powers_m[None, :, :])
            batch = _tree_sum_mod(terms.transpose(1, 0, 2))
            inner = kb.add(
                kb.sub(constr, ext.ext4_mul(geq_x, adj_m[None, :])), batch
            )
            total = ext.ext4_mul(eq_x, inner)  # (num_points*blk, 4)
            mask = (i * blk + jnp.arange(blk)) < n_pairs_live
            t = total.reshape(num_points, blk, 4)
            t = jnp.where(mask[None, :, None], t, 0)
            # sum the pair axis for all X points at once (log-depth)
            part = _tree_sum_mod(t.transpose(1, 0, 2))
            return kb.add(sums, part)

        init = jnp.zeros((num_points, 4), jnp.uint32)
        if n_blocks == 1:
            return body(0, init)
        return jax.lax.fori_loop(0, n_blocks, body, init)

    try:
        setattr(chip, attr, local_sums)
    except AttributeError:
        pass
    return local_sums


def _make_packed_round_kernel(chip, num_points: int):
    """Single-device jit of the restricted sums (one compile per shape)."""
    attr = f"_zc_packed_kernel_{num_points}"
    cached = getattr(chip, attr, None)
    if cached is not None:
        return cached
    kernel = jax.jit(_make_local_sums_fn(chip, num_points))
    try:
        setattr(chip, attr, kernel)
    except AttributeError:
        pass
    return kernel


def _make_sharded_round_kernel(chip, num_points: int, mesh):
    """shard_map'd restricted sums over the mesh's row blocks.

    Each device computes its block's (num_points, 4) partials with the
    SAME local-sums body as the single-device kernel, then the partials
    reduce with a modular butterfly allreduce over ICI. Valid while each
    device still owns >= 1 live pair (the poly switches to the host
    below that).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel import mesh as pm

    nd = pm.mesh_size(mesh)
    attr = f"_zc_sharded_kernel_{num_points}_{nd}"
    cached = getattr(chip, attr, None)
    if cached is not None:
        return cached
    local_sums = _make_local_sums_fn(chip, num_points)

    def per_device(table, n_pairs_live, apow_m, gkr_powers_m, adj_m, pv_m):
        # table: LOCAL (n/nd, Wt, 4) block; live pairs split evenly since
        # every device folds into its local first half (MSB sharding).
        part = local_sums(
            table, n_pairs_live // nd, apow_m, gkr_powers_m, adj_m, pv_m
        )
        return pm.psum_mod(part, "d", nd)

    kernel = jax.jit(
        pm.shard_map_fn(
            per_device,
            mesh,
            in_specs=(P("d", None, None), P(), P(None, None), P(None, None),
                      P(None), P(None, None)),
            out_specs=P(None, None),
        )
    )
    try:
        setattr(chip, attr, kernel)
    except AttributeError:
        pass
    return kernel


_SHARDED_FOLD_KERNELS = {}


def _fold_packed_sharded(table, alpha_m, mesh):
    """Per-device-local fold of the packed table (live pairs shrink into
    each device's local first half; MSB row sharding keeps pairs local)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel import mesh as pm

    wt = int(table.shape[1])
    key = (wt, pm.mesh_size(mesh), id(mesh))
    k = _SHARDED_FOLD_KERNELS.get(key)
    if k is None:
        def fold_local(t, am):
            v = t.reshape(t.shape[0] // 2, 2, t.shape[1], 4)
            lo, hi = v[:, 0], v[:, 1]
            diff = ext.ext4_sub(hi, lo)
            folded = ext.ext4_add(
                lo, ext.ext4_mul(diff, jnp.broadcast_to(am, diff.shape))
            )
            return jnp.concatenate([folded, jnp.zeros_like(folded)], axis=0)

        k = jax.jit(
            pm.shard_map_fn(
                fold_local,
                mesh,
                in_specs=(P("d", None, None), P(None)),
                out_specs=P("d", None, None),
            )
        )
        _SHARDED_FOLD_KERNELS[key] = k
    return k(table, alpha_m)


_FOLD_KERNELS = {}


def _fold_packed_body(t, am):
    """Inlinable fold of a packed (n, W, 4) table's live pairs into its
    first half; dead tail zeroed (shared by the jitted kernel below and
    the fused round step in iop/dsumcheck.py)."""
    v = t.reshape(t.shape[0] // 2, 2, t.shape[1], 4)
    lo, hi = v[:, 0], v[:, 1]
    diff = ext.ext4_sub(hi, lo)
    folded = ext.ext4_add(
        lo, ext.ext4_mul(diff, jnp.broadcast_to(am, diff.shape))
    )
    return jnp.concatenate([folded, jnp.zeros_like(folded)], axis=0)


def _fold_packed(table, alpha_m):
    """Fold the packed table's live pairs into its first half (fixed shape:
    one compile per table shape). Dead tail is zeroed."""
    wt = int(table.shape[1])
    k = _FOLD_KERNELS.get(wt)
    if k is None:
        k = jax.jit(_fold_packed_body)
        _FOLD_KERNELS[wt] = k
    return k(table, alpha_m)


_BUILD_KERNELS = {}


def _build_packed(main_trace, prep_trace, eq, height):
    """Pack [main|prep|eq|geq] into one (n, Wt, 4) monty table."""
    key = (int(main_trace.shape[1]), int(prep_trace.shape[1]))
    k = _BUILD_KERNELS.get(key)
    if k is None:
        @jax.jit
        def k(mt, pt, eq_, h):
            n = mt.shape[0]
            one_m = np.zeros(4, np.uint32)
            one_m[0] = kb.to_monty_i(1)
            geq = jnp.where(
                (jnp.arange(n) >= h)[:, None],
                jnp.broadcast_to(jnp.asarray(one_m), (n, 4)),
                jnp.zeros((n, 4), jnp.uint32),
            )
            return jnp.concatenate(
                [
                    mle_ops.ext4_embed(mt),  # (n, W, 4)
                    mle_ops.ext4_embed(pt),  # (n, Wp, 4)
                    eq_[:, None, :],
                    geq[:, None, :],
                ],
                axis=1,
            )
        _BUILD_KERNELS[key] = k
    return k(main_trace, prep_trace, eq, height)


_EQ_KERNEL = None
_EQ_CACHE = {}


def _build_eq(zeta_m):
    """eq table for the zerocheck point (shared by every chip per prove)."""
    global _EQ_KERNEL
    if _EQ_KERNEL is None:
        _EQ_KERNEL = jax.jit(mle_ops.partial_lagrange_ext)
    key = np.asarray(zeta_m).tobytes()
    hit = _EQ_CACHE.get(key)
    if hit is None:
        if len(_EQ_CACHE) > 2:
            _EQ_CACHE.clear()
        hit = _EQ_KERNEL(zeta_m)
        _EQ_CACHE[key] = hit
    return hit


class DevZeroCheckPoly:
    """Device zerocheck poly over the packed [main|prep|eq|geq] table.

    Fixed-size buffer across rounds (live region shrinks into the front
    half on each fold) so each chip needs exactly ONE round-kernel and
    ONE fold-kernel compile for the whole sumcheck. Hands off to the
    host ZeroCheckPoly below HOST_THRESH rows.
    """

    degree = MAX_CONSTRAINT_DEGREE + 1

    def __init__(self, chip, table, n_live, alpha_c, adj_c, gkr_powers_c, pv_c):
        from ..parallel import mesh as pm

        self.chip = chip
        self.table = table  # (n, Wt, 4) monty
        self.n_live = n_live
        self.alpha_c = alpha_c
        self.adj_c = adj_c
        self.gkr_powers_c = gkr_powers_c
        self.pv_c = pv_c
        self.host = False
        tape = air_tape.trace_chip_tape(chip, n_pv=pv_c.shape[0])
        apow = air_tape.alpha_powers(alpha_c, tape.n_constraints)
        self._apow_m = jnp.asarray(_to_monty_np(apow))
        self._gkr_m = jnp.asarray(_to_monty_np(gkr_powers_c))
        self._adj_m = jnp.asarray(_to_monty_np(adj_c))
        self._pv_m = jnp.asarray(_to_monty_np(pv_c))
        mesh = pm.active_mesh()
        self.mesh = mesh if (mesh and n_live >= 4 * pm.mesh_size(mesh)) else None
        if self.mesh is not None:
            self.table = jax.device_put(table, pm.row_sharding(self.mesh, 3))
            self._kernel = _make_sharded_round_kernel(chip, self.degree + 1, self.mesh)
        else:
            self._kernel = _make_packed_round_kernel(chip, self.degree + 1)

    @property
    def num_variables(self):
        return int(self.n_live).bit_length() - 1

    def sum_values_device(self):
        """(degree+2, 4) monty restricted sums as a device array."""
        return self._kernel(
            self.table,
            jnp.uint32(self.n_live // 2),
            self._apow_m,
            self._gkr_m,
            self._adj_m,
            self._pv_m,
        )

    def coeffs_from_sums(self, ys) -> np.ndarray:
        return interp_coeffs(list(ys))

    def sum_as_poly_in_last_variable(self, claim=None) -> np.ndarray:
        ys = _from_monty_np(self.sum_values_device().reshape(-1)).reshape(-1, 4)
        return interp_coeffs(list(ys))

    def fix_last_variable(self, alpha):
        # Stay device-resident to the very last round: handing the tail to
        # host numpy would fetch (HOST_THRESH x Wt x 16B) per chip over a
        # ~15 MB/s link — far more than the 3ms masked full-buffer folds.
        am = jnp.asarray(_to_monty_np(np.asarray(alpha, np.uint32)))
        if self.mesh is not None:
            from ..parallel import mesh as pm

            nd = pm.mesh_size(self.mesh)
            table = _fold_packed_sharded(self.table, am, self.mesh)
            n_live = self.n_live // 2
            if n_live < 2 * nd:
                # every device is down to < 1 live pair: gather the tiny
                # live remainder and finish the tail rounds on the host.
                n = int(table.shape[0])
                lg = n_live // nd
                idx = np.concatenate(
                    [d * (n // nd) + np.arange(lg) for d in range(nd)]
                )
                live = table[jnp.asarray(idx, jnp.int32)]
                return self._to_host_poly(live, n_live)
            poly = object.__new__(DevZeroCheckPoly)
            poly.__dict__.update(self.__dict__)
            poly.table = table
            poly.n_live = n_live
            return poly
        table = _fold_packed(self.table, am)
        poly = object.__new__(DevZeroCheckPoly)
        poly.__dict__.update(self.__dict__)
        poly.table = table
        poly.n_live = self.n_live // 2
        return poly

    def fix_last_variable_dev(self, am) -> "DevZeroCheckPoly":
        """Device-challenger fold: alpha arrives as a (4,) monty device
        array and the poly NEVER hands off to the host (iop.dsumcheck)."""
        if self.mesh is not None:
            from ..parallel import mesh as pm

            nd = pm.mesh_size(self.mesh)
            am = pm.replicate(am, self.mesh)
            table = _fold_packed_sharded(self.table, am, self.mesh)
            n_live = self.n_live // 2
            if n_live >= 2 * nd:
                poly = object.__new__(DevZeroCheckPoly)
                poly.__dict__.update(self.__dict__)
                poly.table = table
                poly.n_live = n_live
                return poly
            # gather the live remainder onto one device and continue there
            n = int(table.shape[0])
            lg = max(n_live // nd, 1)
            idx = np.concatenate(
                [d * (n // nd) + np.arange(lg) for d in range(nd)]
            )[:n_live]
            live = jax.device_put(
                table[jnp.asarray(idx, jnp.int32)], jax.devices()[0]
            )
            poly = object.__new__(DevZeroCheckPoly)
            poly.__dict__.update(self.__dict__)
            poly.mesh = None
            poly.table = live
            poly.n_live = n_live
            poly._kernel = _make_packed_round_kernel(self.chip, self.degree + 1)
            return poly
        table = _fold_packed(self.table, am)
        poly = object.__new__(DevZeroCheckPoly)
        poly.__dict__.update(self.__dict__)
        poly.table = table
        poly.n_live = self.n_live // 2
        return poly

    def component_evals_device(self):
        """(Wp+W, 4) monty evals at the final point: prep cols then main."""
        wm, wp = self.chip.width, self.chip.preprocessed_width
        row = self.table[0]
        return jnp.concatenate([row[wm : wm + wp], row[:wm]], axis=0)

    def fused_parts(self):
        """(sums_fn, fold_fn, table, aux, set_table) for the one-dispatch-
        per-round fused driver (iop/dsumcheck.py). None when sharded."""
        if self.mesh is not None or self.host:
            return None
        sums_fn = _make_local_sums_fn(self.chip, self.degree + 1)

        def clone(table):
            poly = object.__new__(DevZeroCheckPoly)
            poly.__dict__.update(self.__dict__)
            poly.table = table
            poly.n_live = 1
            return poly

        return (
            sums_fn,
            _fold_packed_body,
            self.table,
            (self._apow_m, self._gkr_m, self._adj_m, self._pv_m),
            clone,
        )

    def _to_host_poly(self, live_table, n_live) -> "ZeroCheckPoly":
        """Materialize the host-tail poly from the (n_live, Wt, 4) rows."""
        wm, wp = self.chip.width, self.chip.preprocessed_width
        live = hostmle.dev_to_host(live_table[:n_live])  # canonical
        return ZeroCheckPoly(
            self.chip,
            live[:, wm + wp],          # eq
            live[:, wm + wp + 1],      # geq (ext)
            live[:, :wm],              # main (ext)
            live[:, wm : wm + wp],     # prep (ext)
            None, None, None, None,
            alpha_c=self.alpha_c,
            adj_c=self.adj_c,
            gkr_powers_c=self.gkr_powers_c,
            pv_c=self.pv_c,
        )

    def get_component_poly_evals(self) -> list:
        """[preprocessed col evals..., main col evals...] at the final point."""
        wm, wp = self.chip.width, self.chip.preprocessed_width
        row = _from_monty_np(self.table[0].reshape(-1)).reshape(-1, 4)
        return [row[wm + i] for i in range(wp)] + [row[i] for i in range(wm)]


class ZeroCheckPoly:
    degree = MAX_CONSTRAINT_DEGREE + 1

    def __init__(self, chip, eq, geq, main, prep, alpha_m, adj_m, gkr_powers_m, pv_m,
                 alpha_c=None, adj_c=None, gkr_powers_c=None, pv_c=None):
        self.chip = chip
        self.eq = eq
        self.geq = geq
        self.main = main  # (2^k, W, 4) monty (device) or canonical (host)
        self.prep = prep  # (2^k, Wp, 4)
        self.alpha_m = alpha_m
        self.adj_m = adj_m
        self.gkr_powers_m = gkr_powers_m
        self.pv_m = pv_m
        self.alpha_c = alpha_c
        self.adj_c = adj_c
        self.gkr_powers_c = gkr_powers_c
        self.pv_c = pv_c
        self.host = isinstance(eq, np.ndarray)
        self._apow = None  # alpha powers for the tape combine (host, lazy)
        self._kernel = None if self.host else _make_round_kernel(chip, self.degree + 1)

    @property
    def num_variables(self):
        return int(self.eq.shape[0]).bit_length() - 1

    def _host_sums(self) -> list:
        # Tape-driven evaluation: the chip's constraint tape runs ONCE on
        # all degree+1 X-points stacked along the row axis; the Horner
        # alpha-fold and the gkrc column batching become exact modular
        # matmuls (see air/tape.py). Round 1 runs entirely in the base
        # field (trace tables are still base there).
        n2 = self.eq.shape[0] // 2
        D = self.degree + 1
        N = D * n2
        eq_s = np.concatenate([hostmle.at_x(self.eq, x) for x in range(D)], axis=0)
        geq_s = np.concatenate([hostmle.at_x(self.geq, x) for x in range(D)], axis=0)
        main_s = np.concatenate([hostmle.at_x(self.main, x) for x in range(D)], axis=0)
        if self.prep.shape[1]:
            prep_s = np.concatenate(
                [hostmle.at_x(self.prep, x) for x in range(D)], axis=0
            )
        else:
            prep_s = np.zeros((N, 0) + self.main.shape[2:], self.main.dtype)
        E = ext.npext4
        base_mode = main_s.ndim == 2
        tape = air_tape.trace_chip_tape(self.chip, n_pv=self.pv_c.shape[0])
        if self._apow is None:
            self._apow = air_tape.alpha_powers(self.alpha_c, tape.n_constraints)
        gkrp = self.gkr_powers_c.astype(np.uint64)
        if base_mode:
            roots = air_tape.run_base(tape, main_s, prep_s, self.pv_c[:, 0])
            constr = air_tape.ext_weighted_sum_base(self._apow, roots)
            # padded-row adjustment: geq is base 0/1-interpolated here
            adjt = (
                self.adj_c[None, :].astype(np.int64) * geq_s[:, None].astype(np.int64)
            ) % kb.P
            cols = np.concatenate([main_s.T, prep_s.T], axis=0)  # (W+Wp, N)
            batch = air_tape.ext_weighted_sum_base(gkrp, cols)
        else:
            roots = air_tape.run_ext(tape, main_s, prep_s, self.pv_c)
            constr = air_tape.ext_weighted_sum_ext(self._apow, roots)
            adjt = E.mul(geq_s, np.broadcast_to(self.adj_c, (N, 4)))
            cols = np.concatenate(
                [main_s.transpose(1, 0, 2), prep_s.transpose(1, 0, 2)], axis=0
            )
            batch = air_tape.ext_weighted_sum_ext(gkrp, cols.astype(np.uint64))
        inner = E.add(E.sub(constr.astype(np.uint32), adjt.astype(np.uint32)), batch)
        total = E.mul(eq_s, inner)
        return [
            hostmle.sum0_fast(total[x * n2: (x + 1) * n2]) for x in range(D)
        ]

    def sum_as_poly_in_last_variable(self, claim=None) -> np.ndarray:
        if self.host:
            return interp_coeffs(self._host_sums())
        sums = self._kernel(
            self.eq,
            self.geq,
            self.main,
            self.prep,
            self.alpha_m,
            self.adj_m,
            self.gkr_powers_m,
            self.pv_m,
        )
        ys = [_from_monty_np(s) for s in sums]
        return interp_coeffs(ys)

    def _to_host(self):
        self.eq = hostmle.dev_to_host(self.eq)
        self.geq = hostmle.dev_to_host(self.geq)
        self.main = hostmle.dev_to_host(self.main)
        self.prep = hostmle.dev_to_host(self.prep)
        self.host = True
        self._kernel = None

    def fix_last_variable(self, alpha) -> "ZeroCheckPoly":
        poly = object.__new__(ZeroCheckPoly)
        poly.chip = self.chip
        poly.alpha_m = self.alpha_m
        poly.adj_m = self.adj_m
        poly.gkr_powers_m = self.gkr_powers_m
        poly.pv_m = self.pv_m
        poly.alpha_c = self.alpha_c
        poly.adj_c = self.adj_c
        poly.gkr_powers_c = self.gkr_powers_c
        poly.pv_c = self.pv_c
        poly._apow = self._apow
        if self.host:
            alpha = np.asarray(alpha, np.uint32)
            poly.eq = hostmle.fix_last(self.eq, alpha)
            if self.main.ndim == 2:
                # base tables fold into the extension field here
                poly.geq = hostmle.fix_last_base_to_ext(self.geq, alpha)
                poly.main = hostmle.fix_last_base_to_ext(self.main, alpha)
                poly.prep = hostmle.fix_last_base_to_ext(self.prep, alpha)
            else:
                poly.geq = hostmle.fix_last(self.geq, alpha)
                poly.main = hostmle.fix_last(self.main, alpha)
                poly.prep = hostmle.fix_last(self.prep, alpha)
            poly.host = True
            poly._kernel = None
            return poly
        am = jnp.asarray(_to_monty_np(alpha))
        eq, geq, main, prep = _fix_last_tables(
            self.eq, self.geq, self.main, self.prep, am
        )
        poly.eq, poly.geq, poly.main, poly.prep = eq, geq, main, prep
        poly.host = False
        poly._kernel = self._kernel
        poly._apow = None
        if int(eq.shape[0]) <= HOST_THRESH:
            poly._to_host()
        return poly

    def get_component_poly_evals(self) -> list:
        """[preprocessed col evals..., main col evals...] at the final point.

        Reference: crates/hypercube/src/prover/zerocheck/mod.rs:95.
        """
        def _ext_of(v):
            if not self.host:
                return _from_monty_np(v)
            v = np.asarray(v, np.uint32)
            if v.shape != (4,):  # base scalar (0-variable base table)
                e = np.zeros(4, np.uint32)
                e[0] = v
                return e
            return v

        out = []
        for i in range(self.prep.shape[1]):
            out.append(_ext_of(self.prep[0, i]))
        for i in range(self.main.shape[1]):
            out.append(_ext_of(self.main[0, i]))
        return out


def make_zerocheck_poly(
    chip,
    main_trace,  # (2^mlrc, W) base monty jnp, zero-padded
    prep_trace,  # (2^mlrc, Wp) or None
    height: int,
    zeta: np.ndarray,  # (mlrc, 4) canonical — GKR point
    alpha: np.ndarray,
    gkr_batch_challenge: np.ndarray,
    public_values: list,
    force_device: bool = False,
) -> ZeroCheckPoly:
    n = int(main_trace.shape[0])
    mlrc = n.bit_length() - 1
    host_small = n <= HOST_THRESH and not force_device
    adj = padded_row_adjustment_host(chip, public_values, alpha)
    # gkr powers: gkrc^1, gkrc^2, ... for main+prep columns
    w_total = chip.width + chip.preprocessed_width
    powers = []
    p = np.asarray(gkr_batch_challenge, np.uint32)
    for _ in range(w_total):
        powers.append(p)
        p = E4.mul(p, gkr_batch_challenge)
    pv_arr = np.zeros((len(public_values), 4), np.uint32)
    for i, v in enumerate(public_values):
        pv_arr[i, 0] = int(v) % kb.P

    if host_small:
        # Pure-numpy table build: no jit compiles on the host path. Main
        # and preprocessed tables stay BASE field (2D) until the first
        # fix_last fold; geq is a base 0/1 column.
        main_c = hostmle.dev_to_host(main_trace)  # (n, W) canonical
        eq_c = mle_ops.host.partial_lagrange_ext(np.asarray(zeta, np.uint32))
        geq_c = np.zeros(n, np.uint32)
        geq_c[height:] = 1
        wp = chip.preprocessed_width
        if prep_trace is not None and wp:
            prep_c = hostmle.dev_to_host(prep_trace)
        else:
            prep_c = np.zeros((n, 0), np.uint32)
        return ZeroCheckPoly(
            chip, eq_c, geq_c, main_c, prep_c, None, None, None, None,
            alpha_c=np.asarray(alpha, np.uint32),
            adj_c=np.asarray(adj, np.uint32),
            gkr_powers_c=np.stack(powers),
            pv_c=pv_arr,
        )

    if prep_trace is None or int(prep_trace.shape[1]) == 0:
        prep_trace = jnp.zeros((n, 0), jnp.uint32)
    eq = _build_eq(jnp.asarray(_to_monty_np(zeta)))
    table = _build_packed(main_trace, prep_trace, eq, jnp.uint32(height))
    return DevZeroCheckPoly(
        chip, table, n,
        alpha_c=np.asarray(alpha, np.uint32),
        adj_c=np.asarray(adj, np.uint32),
        gkr_powers_c=np.stack(powers),
        pv_c=pv_arr,
    )
