"""LogUp GKR: the lookup/permutation argument, TPU-native.

Proves that the signed sum over all chips' interactions of
multiplicity / fingerprint equals the public-values cumulative sum, via a
layered GKR circuit over fraction additions (reference:
crates/hypercube/src/logup_gkr/{prover,verifier,cpu,logup_poly}.rs).

Circuit layout: fractions are indexed by (interaction || row) variables,
interactions most significant. Each layer halves the ROW variables by
fraction addition on adjacent row pairs:
    n' = n0*d1 + n1*d0,  d' = d0*d1.
The output layer has (interaction_vars + 1) variables. Each GKR round is
a degree-3 sumcheck of eq(rho, x)*[lambda*(n0 d1 + n1 d0) + d0 d1].

Device work: first-layer materialization (interaction affine evals over
all trace rows), each layer transition, and each sumcheck round's
restricted sums are jit-compiled elementwise ext4 kernels.

GKR grinding: 12 bits (reference: verifier/shard.rs:41).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..field import extension as ext
from ..field import koalabear as kb
from ..iop import sumcheck as sc
from ..iop.challenger import DuplexChallenger
from ..ops import mle as mle_ops
from ..ops import hostmle
from ..ops.hostmle import HOST_THRESH
from ..pcs.jagged import full_geq_host, log2_ceil, point_from_usize
from ..utils import timing


def _spanned_range(n_layers):
    """range(n_layers - 2, -1, -1), accumulating per-iteration wall time
    into the "rounds" timing key (the per-layer sumcheck loop)."""
    import time as _time

    for i in range(n_layers - 2, -1, -1):
        t0 = _time.perf_counter()
        yield i
        timing._TOTALS["gkr_rounds"] = timing._TOTALS.get(
            "gkr_rounds", 0.0
        ) + (_time.perf_counter() - t0)

E4 = ext.npext4

_pl_jit = jax.jit(mle_ops.partial_lagrange_ext)
_eval_mle_jit = jax.jit(mle_ops.eval_mle_at_point_ext)

GKR_GRINDING_BITS = 12


def scoped_interactions(chip, scope: str) -> list:
    """[(interaction, is_send)] for one chip, filtered by scope."""
    return [(i, True) for i in chip.sends() if i.scope == scope] + [
        (i, False) for i in chip.receives() if i.scope == scope
    ]


def _to_monty_np(x):
    return ((np.asarray(x, np.uint64) << 32) % kb.P).astype(np.uint32)


def _from_monty_np(x):
    return np.asarray(kb.from_monty(jnp.asarray(x)), np.uint32)


# ---------------------------------------------------------------------------
# First layer + transitions (device)
# ---------------------------------------------------------------------------


def _chip_first_layer_kernel(chip, scope="local"):
    """One jit per chip computing all its interaction fraction tables."""
    attr = f"_fl_kernel_{scope}"
    if getattr(chip, attr, None) is not None:
        return getattr(chip, attr)

    from ..air.builder import JnpOps

    @jax.jit
    def kernel(main, prep, alpha_m, betas_m, real_mask):
        n_rows = main.shape[0]
        ops = JnpOps(n_rows)
        one = np.zeros(4, np.uint32)
        one[0] = kb.to_monty_i(1)
        main_cols = [mle_ops.ext4_embed(main[:, i]) for i in range(chip.width)]
        prep_cols = [
            mle_ops.ext4_embed(prep[:, i]) for i in range(chip.preprocessed_width)
        ]
        alpha_b = jnp.broadcast_to(alpha_m, (n_rows, 4))
        betas_b = [
            jnp.broadcast_to(betas_m[i], (n_rows, 4)) for i in range(betas_m.shape[0])
        ]
        real = real_mask[:, None]
        nums, dens = [], []
        for inter, is_send in scoped_interactions(chip, scope):
            mult, fp = inter.eval(prep_cols, main_cols, alpha_b, betas_b, ops)
            if not is_send:
                mult = ext.ext4_neg(mult)
            nums.append(jnp.where(real, mult, jnp.zeros_like(mult)))
            dens.append(
                jnp.where(real, fp, jnp.broadcast_to(jnp.asarray(one), fp.shape))
            )
        # component-major (4, rows*ints) output — the SoA layer layout
        num = jnp.concatenate(nums, axis=0).T
        den = jnp.concatenate(dens, axis=0).T
        return num, den

    setattr(chip, attr, kernel)
    return kernel


def _host_first_layer(chip, main, prep, h, alpha, betas, n_rows, scope="local"):
    """Canonical numpy first-layer tables for one chip (no compiles)."""
    from ..ops.hostmle import NpVecOps, dev_to_host

    main_c = dev_to_host(main)
    prep_c = dev_to_host(prep) if prep is not None else None
    ops = NpVecOps(n_rows)
    main_cols = [
        np.stack([main_c[:, i]] + [np.zeros(n_rows, np.uint32)] * 3, axis=-1)
        for i in range(chip.width)
    ]
    prep_cols = (
        [
            np.stack([prep_c[:, i]] + [np.zeros(n_rows, np.uint32)] * 3, axis=-1)
            for i in range(chip.preprocessed_width)
        ]
        if prep_c is not None
        else []
    )
    alpha_b = np.broadcast_to(np.asarray(alpha, np.uint32), (n_rows, 4))
    betas_b = [
        np.broadcast_to(np.asarray(betas[i], np.uint32), (n_rows, 4))
        for i in range(len(betas))
    ]
    real = (np.arange(n_rows) < h)[:, None]
    one_row = np.zeros((1, 4), np.uint32)
    one_row[0, 0] = 1
    nums, dens = [], []
    for inter, is_send in scoped_interactions(chip, scope):
        mult, fp = inter.eval(prep_cols, main_cols, alpha_b, betas_b, ops)
        if not is_send:
            mult = E4.sub(np.zeros_like(mult), mult)
        nums.append(np.where(real, mult, 0).astype(np.uint32))
        dens.append(np.where(real, fp, one_row).astype(np.uint32))
    return np.concatenate(nums, axis=0), np.concatenate(dens, axis=0)


def materialize_first_layer(chips, preprocessed, traces, heights, alpha, betas, scope="local", force_device=False):
    """Build the leaf fraction tables.

    chips: list of Chip. traces: dict name -> (2^mlrc, W) monty jnp.
    heights: dict name -> real height. alpha/betas: canonical (4,) arrays
    (betas = partial_lagrange of the beta seed).
    Returns (num, den): (2^(iv+mlrc), 4) monty jnp arrays; padded
    interactions hold (0, 1).
    """
    mlrc = int(next(iter(traces.values())).shape[0]).bit_length() - 1
    num_interactions = sum(len(scoped_interactions(c, scope)) for c in chips)
    iv = log2_ceil(num_interactions)
    n_rows = 1 << mlrc
    alpha_m = jnp.asarray(_to_monty_np(alpha))
    betas_m = jnp.asarray(_to_monty_np(np.asarray(betas, np.uint32)))

    num_parts, den_parts = [], []
    one = np.zeros(4, np.uint32)
    one[0] = kb.to_monty_i(1)
    host_small = n_rows <= HOST_THRESH and not force_device
    for chip in chips:
        if not scoped_interactions(chip, scope):
            continue
        main = traces[chip.name]
        prep = preprocessed.get(chip.name)
        h = heights[chip.name]
        if host_small:
            # Stay in canonical numpy: the whole GKR tree runs on host.
            nums_c, dens_c = _host_first_layer(
                chip, main, prep, h, alpha, betas, n_rows, scope
            )
            num_parts.append(nums_c)
            den_parts.append(dens_c)
            continue
        if prep is None:
            prep = jnp.zeros((n_rows, 0), jnp.uint32)
        real_mask = jnp.asarray(np.arange(n_rows) < h)
        kernel = _chip_first_layer_kernel(chip, scope)
        nums, dens = kernel(main, prep, alpha_m, betas_m, real_mask)
        num_parts.append(nums)
        den_parts.append(dens)
    pad = (1 << iv) - num_interactions
    if pad:
        if host_small:
            zeros_c = np.zeros((n_rows, 4), np.uint32)
            ones_c = np.zeros((n_rows, 4), np.uint32)
            ones_c[:, 0] = 1
            for _ in range(pad):
                num_parts.append(zeros_c)
                den_parts.append(ones_c)
        else:
            zeros = jnp.zeros((4, n_rows), jnp.uint32)
            ones_c = np.zeros((4, 1), np.uint32)
            ones_c[0, 0] = kb.to_monty_i(1)
            ones = jnp.broadcast_to(jnp.asarray(ones_c), (4, n_rows))
            for _ in range(pad):
                num_parts.append(zeros)
                den_parts.append(ones)
    if host_small:
        return (
            np.concatenate(num_parts, axis=0),
            np.concatenate(den_parts, axis=0),
            iv,
        )
    # FLAT component-major (SoA) at rest: [c0 of all rows, c1, c2, c3]
    # — see _lrows for the TPU layout rationale. Device parts are
    # (4, rows*ints) component-major already.
    num = jnp.concatenate(num_parts, axis=1).reshape(-1)
    den = jnp.concatenate(den_parts, axis=1).reshape(-1)
    return num, den, iv


_LAYER_TREE_FNS = {}


def _lrows(a) -> int:
    """Logical row count of a layer array.

    Device layer arrays are FLAT (4N,) u32: a (N, 4) parameter can get
    XLA layout {1,0:T(8,128)} — the 4-wide minor dim padded to 128 lanes,
    a 32x HBM expansion that OOMs the layer tree at mlrc >= 18 (observed:
    a 512 MB (2^25, 4) `den` allocating 16.00 GB). 1D params tile as
    T(1024) with no padding. Host layer arrays stay (N, 4) numpy."""
    return int(a.shape[0]) // 4 if a.ndim == 1 else int(a.shape[0])


def _layer_tree_fused(num, den, steps: int):
    """All layer transitions in one jit -> tuple of flat (num, den)."""
    key = (tuple(num.shape), steps)
    fn = _LAYER_TREE_FNS.get(key)
    if fn is None:

        @jax.jit
        def fn(num, den):
            out = []
            for _ in range(steps):
                num, den = _layer_transition(num, den)
                out.append((num, den))
            return tuple(out)

        _LAYER_TREE_FNS[key] = fn
    return fn(num, den)


@jax.jit
def _layer_transition(num, den):
    """flat SoA (8M,), (8M,) -> flat SoA (4M,), (4M,): fraction addition
    on adjacent ext4 pairs (logical (2M,4) -> (M,4)). Component-major
    arithmetic: every temp is a (4, M) stack of full-width base vectors —
    nothing with a 4-wide minor dim ever materializes (see _lrows)."""
    n = num.reshape(4, -1)
    d = den.reshape(4, -1)
    n0, n1 = n[:, 0::2], n[:, 1::2]
    d0, d1 = d[:, 0::2], d[:, 1::2]
    new_n = kb.add(ext.ext4_mul_soa(n0, d1), ext.ext4_mul_soa(n1, d0))
    new_d = ext.ext4_mul_soa(d0, d1)
    return new_n.reshape(-1), new_d.reshape(-1)


@jax.jit
def _gkr_round_sums(eq, n0, n1, d0, d1, lam):
    """Restricted sums of eq*[lam*(n0 d1 + n1 d0) + d0 d1] at X=0,1,2,3.

    All tables (2m, 4); pairs (2i, 2i+1) are (X=0, X=1) slices of the last
    variable. Returns 4 ext values.
    """
    outs = []
    tabs = [t.reshape(-1, 2, 4) for t in (eq, n0, n1, d0, d1)]
    for x in range(4):
        vals = []
        for t in tabs:
            lo, hi = t[:, 0], t[:, 1]
            if x == 0:
                vals.append(lo)
            elif x == 1:
                vals.append(hi)
            else:
                diff = kb.sub(hi, lo)
                v = hi
                for _ in range(x - 1):
                    v = kb.add(v, diff)
                vals.append(v)
        eq_x, n0_x, n1_x, d0_x, d1_x = vals
        inner = ext.ext4_add(
            ext.ext4_mul(
                ext.ext4_add(
                    ext.ext4_mul(n0_x, d1_x), ext.ext4_mul(n1_x, d0_x)
                ),
                jnp.broadcast_to(lam, n0_x.shape),
            ),
            ext.ext4_mul(d0_x, d1_x),
        )
        outs.append(mle_ops._sum_ext_axis0(ext.ext4_mul(eq_x, inner)))
    # one stacked result -> one device->host transfer per round
    return jnp.stack(outs)


@jax.jit
def _fix_last_5(eq, n0, n1, d0, d1, alpha):
    return tuple(
        mle_ops.fix_last_variable_ext(t, alpha) for t in (eq, n0, n1, d0, d1)
    )


_VANDER4_INV = None


def _interp4(ys: list) -> np.ndarray:
    """Coefficients of the cubic through (0..3, ys)."""
    global _VANDER4_INV
    if _VANDER4_INV is None:
        v = np.array([[pow(x, k, kb.P) for k in range(4)] for x in range(4)], np.int64)
        # invert mod p using fraction-free Gauss (4x4, do with python ints)
        import fractions

        m = [[int(v[i][j]) for j in range(4)] for i in range(4)]
        inv = [[1 if i == j else 0 for j in range(4)] for i in range(4)]
        for col in range(4):
            piv = next(r for r in range(col, 4) if m[r][col] % kb.P != 0)
            m[col], m[piv] = m[piv], m[col]
            inv[col], inv[piv] = inv[piv], inv[col]
            pinv = pow(m[col][col], kb.P - 2, kb.P)
            m[col] = [x * pinv % kb.P for x in m[col]]
            inv[col] = [x * pinv % kb.P for x in inv[col]]
            for r in range(4):
                if r != col and m[r][col] % kb.P:
                    f = m[r][col] % kb.P
                    m[r] = [(a - f * b) % kb.P for a, b in zip(m[r], m[col])]
                    inv[r] = [(a - f * b) % kb.P for a, b in zip(inv[r], inv[col])]
        _VANDER4_INV = np.array(inv, np.uint32)
    coeffs = []
    for k in range(4):
        acc = np.zeros(4, np.uint32)
        for x in range(4):
            acc = E4.add(acc, kb.npf.mul(ys[x], _VANDER4_INV[k][x]))
        coeffs.append(acc)
    return np.stack(coeffs)


_GKR_SUMS_KERNEL = None
_GKR_SHARDED_KERNELS = {}


@jax.jit
def _build_gkr_table(eq, num, den):
    """Pack a layer into the (m, 5, 4) [eq, n0, n1, d0, d1] table.

    num/den arrive flat SoA (see _lrows); the AoS transpose fuses into
    the table write."""
    if num.ndim == 1:
        n = num.reshape(4, -1)
        d = den.reshape(4, -1)
        n0, n1 = n[:, 0::2].T, n[:, 1::2].T  # (M, 4)
        d0, d1 = d[:, 0::2].T, d[:, 1::2].T
    else:
        nv = num.reshape(-1, 2, 4)
        dv = den.reshape(-1, 2, 4)
        n0, n1, d0, d1 = nv[:, 0], nv[:, 1], dv[:, 0], dv[:, 1]
    return jnp.stack([eq, n0, n1, d0, d1], axis=1)


def _gkr_local_sums(table, n_pairs_live, lam_m):
    """Masked restricted sums over the packed (n, 5, 4) [eq,n0,n1,d0,d1]
    table: fixed shape across ALL rounds of a layer's sumcheck (live
    pairs shrink into the front), so one compile serves every round —
    the GKR analog of zerocheck._make_local_sums_fn."""
    from .zerocheck import _tree_sum_mod

    n = table.shape[0]
    n2 = n // 2
    pairs = table.reshape(n2, 2, 5, 4)
    blk = min(2048, max(n2, 1))
    n_blocks = max(n2 // blk, 1)

    def body(i, sums):
        p = jax.lax.dynamic_slice(pairs, (i * blk, 0, 0, 0), (blk, 2, 5, 4))
        lo, hi = p[:, 0], p[:, 1]
        diff = kb.sub(hi, lo)
        xs = [lo, hi]
        cur = hi
        for _ in range(2):  # degree 3 -> X points 0..3
            cur = kb.add(cur, diff)
            xs.append(cur)
        flat = jnp.stack(xs).reshape(4 * blk, 5, 4)
        eq_x = flat[:, 0]
        n0_x, n1_x, d0_x, d1_x = flat[:, 1], flat[:, 2], flat[:, 3], flat[:, 4]
        inner = ext.ext4_add(
            ext.ext4_mul(
                ext.ext4_add(
                    ext.ext4_mul(n0_x, d1_x), ext.ext4_mul(n1_x, d0_x)
                ),
                jnp.broadcast_to(lam_m, n0_x.shape),
            ),
            ext.ext4_mul(d0_x, d1_x),
        )
        total = ext.ext4_mul(eq_x, inner)
        mask = (i * blk + jnp.arange(blk)) < n_pairs_live
        t = total.reshape(4, blk, 4)
        t = jnp.where(mask[None, :, None], t, 0)
        part = _tree_sum_mod(t.transpose(1, 0, 2))
        return kb.add(sums, part)

    init = jnp.zeros((4, 4), jnp.uint32)
    if n_blocks == 1:
        return body(0, init)
    return jax.lax.fori_loop(0, n_blocks, body, init)


def _gkr_packed_kernel():
    global _GKR_SUMS_KERNEL
    if _GKR_SUMS_KERNEL is None:
        _GKR_SUMS_KERNEL = jax.jit(_gkr_local_sums)
    return _GKR_SUMS_KERNEL


def _gkr_sharded_kernel(mesh):
    """shard_map'd GKR restricted sums: each device sums its row block's
    live pairs, partials reduce with the modular ICI butterfly."""
    from jax.sharding import PartitionSpec as P

    from ..parallel import mesh as pm

    nd = pm.mesh_size(mesh)
    key = (nd, id(mesh))
    k = _GKR_SHARDED_KERNELS.get(key)
    if k is None:
        def per_device(table, n_pairs_live, lam_m):
            part = _gkr_local_sums(table, n_pairs_live // nd, lam_m)
            return pm.psum_mod(part, "d", nd)

        k = jax.jit(
            pm.shard_map_fn(
                per_device,
                mesh,
                in_specs=(P("d", None, None), P(), P(None)),
                out_specs=P(None, None),
            )
        )
        _GKR_SHARDED_KERNELS[key] = k
    return k


class PackedLogupRoundPoly:
    """Fixed-shape GKR round poly: (n, 5, 4) packed [eq, n0, n1, d0, d1]
    with live-pair masking. One sums + one fold compile per layer size
    (vs one per ROUND for LogupRoundPoly's shrinking tables), and row
    sharding over the active prover mesh (SURVEY §2.8.7)."""

    degree = 3
    host = False
    tail_fusable = True  # cheap sums body: the fused driver may unroll
    # every remaining small round into one dispatch (iop/dsumcheck.py)

    def __init__(self, table, n_live, lam_m, lam_c=None):
        from ..parallel import mesh as pm

        self.table = table  # (n, 5, 4) monty device
        self.n_live = n_live
        self.lam_m = lam_m
        self.lam_c = lam_c
        mesh = pm.active_mesh()
        self.mesh = mesh if (mesh and n_live >= 4 * pm.mesh_size(mesh)) else None
        if self.mesh is not None:
            self.table = jax.device_put(table, pm.row_sharding(self.mesh, 3))
            # lam may arrive committed to a single device (device-resident
            # challenger); replicate so the shard_map'd kernel accepts it.
            self.lam_m = pm.replicate(jnp.asarray(lam_m), self.mesh)
            self._kernel = _gkr_sharded_kernel(self.mesh)
        else:
            self._kernel = _gkr_packed_kernel()

    @property
    def num_variables(self):
        return int(self.n_live).bit_length() - 1

    def sum_values_device(self):
        return self._kernel(self.table, jnp.uint32(self.n_live // 2), self.lam_m)

    def coeffs_from_sums(self, ys) -> np.ndarray:
        return _interp4(list(ys))

    def sum_as_poly_in_last_variable(self, claim=None) -> np.ndarray:
        sums = _from_monty_np(self.sum_values_device().reshape(-1)).reshape(-1, 4)
        return _interp4(list(sums))

    def _folded(self, am):
        """(table', n_live', mesh') after one fold, handling the sharded
        tail gather exactly like zerocheck.DevZeroCheckPoly."""
        from .zerocheck import _fold_packed, _fold_packed_sharded

        if self.mesh is not None:
            from ..parallel import mesh as pm

            nd = pm.mesh_size(self.mesh)
            am = pm.replicate(am, self.mesh)
            table = _fold_packed_sharded(self.table, am, self.mesh)
            n_live = self.n_live // 2
            if n_live >= 2 * nd:
                return table, n_live, self.mesh
            n = int(table.shape[0])
            lg = max(n_live // nd, 1)
            idx = np.concatenate(
                [d * (n // nd) + np.arange(lg) for d in range(nd)]
            )[:n_live]
            live = jax.device_put(
                table[jnp.asarray(idx, jnp.int32)], jax.devices()[0]
            )
            return live, n_live, None
        return _fold_packed(self.table, am), self.n_live // 2, None

    def _clone(self, table, n_live, mesh):
        from ..iop.dchallenger import _unshard

        poly = object.__new__(PackedLogupRoundPoly)
        poly.__dict__.update(self.__dict__)
        poly.table = table
        poly.n_live = n_live
        poly.mesh = mesh
        if mesh is None:
            # leaving the sharded regime: lam must not stay mesh-replicated
            poly.lam_m = _unshard(jnp.asarray(poly.lam_m))
        poly._kernel = (
            _gkr_sharded_kernel(mesh) if mesh is not None else _gkr_packed_kernel()
        )
        return poly

    def fix_last_variable(self, alpha) -> "PackedLogupRoundPoly":
        am = jnp.asarray(_to_monty_np(np.asarray(alpha, np.uint32)))
        return self._clone(*self._folded(am))

    def fix_last_variable_dev(self, am) -> "PackedLogupRoundPoly":
        return self._clone(*self._folded(am))

    def component_evals_device(self):
        """(4, 4) monty [n0, d0, n1, d1] at the final point."""
        row = self.table[0]
        return jnp.stack([row[1], row[3], row[2], row[4]])

    def fused_parts(self):
        """Fused-driver protocol (iop/dsumcheck.py); None when sharded."""
        if self.mesh is not None:
            return None
        from .zerocheck import _fold_packed_body

        def clone(table):
            return self._clone(table, 1, None)

        return (
            _gkr_local_sums,
            _fold_packed_body,
            self.table,
            (self.lam_m,),
            clone,
        )

    def get_component_poly_evals(self) -> list:
        row = _from_monty_np(
            np.asarray(self.table[0], np.uint32).reshape(-1)
        ).reshape(5, 4)
        return [row[1], row[3], row[2], row[4]]


class LogupRoundPoly:
    """Sumcheck poly for one GKR round (degree 3)."""

    degree = 3

    def __init__(self, eq, n0, n1, d0, d1, lam_m, lam_c=None, host=False):
        self.tabs = (eq, n0, n1, d0, d1)
        self.lam_m = lam_m
        self.lam_c = lam_c
        self.host = host

    @property
    def num_variables(self):
        return int(self.tabs[0].shape[0]).bit_length() - 1

    def _host_sums(self) -> list:
        eq, n0, n1, d0, d1 = self.tabs
        ys = []
        for x in range(4):
            eq_x = hostmle.at_x(eq, x)
            n0_x = hostmle.at_x(n0, x)
            n1_x = hostmle.at_x(n1, x)
            d0_x = hostmle.at_x(d0, x)
            d1_x = hostmle.at_x(d1, x)
            lam_b = np.broadcast_to(self.lam_c, n0_x.shape)
            inner = E4.add(
                E4.mul(
                    E4.add(E4.mul(n0_x, d1_x), E4.mul(n1_x, d0_x)), lam_b
                ),
                E4.mul(d0_x, d1_x),
            )
            ys.append(hostmle.sum0_fast(E4.mul(eq_x, inner)))
        return ys

    def sum_values_device(self):
        """(4, 4) monty restricted sums as one device array (one fetch)."""
        return _gkr_round_sums(*self.tabs, self.lam_m)

    def coeffs_from_sums(self, ys) -> np.ndarray:
        return _interp4(list(ys))

    def sum_as_poly_in_last_variable(self, claim=None) -> np.ndarray:
        if self.host:
            return _interp4(self._host_sums())
        sums = _from_monty_np(self.sum_values_device().reshape(-1)).reshape(-1, 4)
        return _interp4(list(sums))

    def fix_last_variable(self, alpha) -> "LogupRoundPoly":
        if self.host:
            alpha = np.asarray(alpha, np.uint32)
            tabs = tuple(hostmle.fix_last(t, alpha) for t in self.tabs)
            return LogupRoundPoly(*tabs, self.lam_m, self.lam_c, host=True)
        am = jnp.asarray(_to_monty_np(alpha))
        tabs = _fix_last_5(*self.tabs, am)
        if int(tabs[0].shape[0]) <= HOST_THRESH:
            tabs = tuple(hostmle.dev_to_host(t) for t in tabs)
            return LogupRoundPoly(*tabs, self.lam_m, self.lam_c, host=True)
        return LogupRoundPoly(*tabs, self.lam_m, self.lam_c)

    def fix_last_variable_dev(self, am) -> "LogupRoundPoly":
        """Device-challenger fold (monty device alpha, no host handoff)."""
        tabs = _fix_last_5(*self.tabs, am)
        return LogupRoundPoly(*tabs, self.lam_m, self.lam_c)

    def component_evals_device(self):
        """(4, 4) monty [n0, d0, n1, d1] at the final point."""
        _, n0, n1, d0, d1 = self.tabs
        return jnp.stack([n0[0], d0[0], n1[0], d1[0]])

    def get_component_poly_evals(self) -> list:
        # [n0, d0, n1, d1] at the final point
        _, n0, n1, d0, d1 = self.tabs
        if self.host:
            return [
                np.asarray(n0[0], np.uint32),
                np.asarray(d0[0], np.uint32),
                np.asarray(n1[0], np.uint32),
                np.asarray(d1[0], np.uint32),
            ]
        return [
            _from_monty_np(n0[0]),
            _from_monty_np(d0[0]),
            _from_monty_np(n1[0]),
            _from_monty_np(d1[0]),
        ]


# ---------------------------------------------------------------------------
# Proof containers
# ---------------------------------------------------------------------------


@dataclass
class LogupGkrRoundProof:
    numerator_0: np.ndarray
    numerator_1: np.ndarray
    denominator_0: np.ndarray
    denominator_1: np.ndarray
    sumcheck_proof: sc.PartialSumcheckProof


@dataclass
class ChipEvaluation:
    main_trace_evaluations: np.ndarray  # (W, 4)
    preprocessed_trace_evaluations: object  # (Wp, 4) or None


@dataclass
class LogUpEvaluations:
    point: np.ndarray  # (mlrc, 4)
    chip_openings: dict  # name -> ChipEvaluation (insertion = chip order)


@dataclass
class LogupGkrProof:
    numerator_output: np.ndarray  # (2^(iv+1), 4)
    denominator_output: np.ndarray
    round_proofs: list
    logup_evaluations: LogUpEvaluations
    witness: int
    cumulative_sum: object = None  # global scope: sum of output fractions


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------


def gkr_beta_seed_dim(machine, chips, scope="local"):
    max_arity = max(
        (
            len(i.values) + 1
            for c in chips
            for i, _ in scoped_interactions(c, scope)
        ),
        default=1,
    )
    pv_arity = machine.max_pv_interaction_arity() if scope == "local" else 1
    return log2_ceil(max(max_arity, pv_arity))


_to_monty_dev = jax.jit(kb.to_monty)
_from_monty_dev = jax.jit(kb.from_monty)


_GKR_MEGA = {}


def _gkr_mega_kernel(layer_shapes: tuple, nbuf0: int, out_left0: int):
    """A GROUP of GKR layers in ONE jit: per layer lam sample, eq table,
    packed-table build, every (shrinking) sumcheck round with the inline
    sponge, the [n0,n1,d0,d1] observation and the last_coord sample. On
    the remote-tunnel TPU each of the ~200 kernels this replaces costs
    ~100ms of fixed execution latency (same pattern as the jagged-eval
    mega-kernel, pcs/jagged.py _je_fused_kernel). Layers are grouped
    (SP1_TPU_GKR_GROUP) because a single all-layers program was big
    enough to OOM-kill the remote TPU compiler."""
    key = (layer_shapes, nbuf0, out_left0)
    cached = _GKR_MEGA.get(key)
    if cached is not None:
        return cached
    from ..iop.dchallenger import InlineSponge
    from ..iop.dsumcheck import _interp_rlc_body, _vinv_monty
    from .zerocheck import _fold_packed_body

    vinv_t = _vinv_monty(4)

    @jax.jit
    def kernel(state, buf, layers, first_eval_point_c, num0_m, den0_m):
        sponge = InlineSponge(state, buf, nbuf0, out_left0)
        vinv = jnp.asarray(vinv_t)
        eval_point_c = first_eval_point_c
        num_m, den_m = num0_m, den0_m
        out = []
        for lnum, lden in layers:
            lam_c = sponge.sample_vec(4)
            lam_m = kb.to_monty(lam_c)
            eq = mle_ops.partial_lagrange_ext(kb.to_monty(eval_point_c))
            table = _build_gkr_table(eq, lnum, lden)
            claim_m = ext.ext4_add(ext.ext4_mul(num_m, lam_m), den_m)
            num_vars = int(table.shape[0]).bit_length() - 1
            n_live = int(table.shape[0])
            msgs, alphas = [], []
            coeffs_m = None
            for _ in range(num_vars):
                sums = _gkr_local_sums(
                    table, jnp.uint32(n_live // 2), lam_m
                )[None]
                coeffs_m, msg_c = _interp_rlc_body(sums, lam_m, vinv, 1, 4)
                sponge.observe_vec(msg_c.reshape(-1))
                alpha4 = sponge.sample_vec(4)
                am = kb.to_monty(alpha4)
                table = _fold_packed_body(table, am)[: table.shape[0] // 2]
                msgs.append(msg_c)
                alphas.insert(0, alpha4)
                n_live //= 2
            row = table[0]
            comp_m = jnp.stack([row[1], row[3], row[2], row[4]])  # n0 d0 n1 d1
            comp_c = kb.from_monty(comp_m)
            sponge.observe_vec(comp_c[0])
            sponge.observe_vec(comp_c[2])
            sponge.observe_vec(comp_c[1])
            sponge.observe_vec(comp_c[3])
            last_coord = sponge.sample_vec(4)
            lc_m = kb.to_monty(last_coord)
            n0m, d0m, n1m, d1m = comp_m[0], comp_m[1], comp_m[2], comp_m[3]
            num_m = ext.ext4_add(
                n0m, ext.ext4_mul(ext.ext4_sub(n1m, n0m), lc_m)
            )
            den_m = ext.ext4_add(
                d0m, ext.ext4_mul(ext.ext4_sub(d1m, d0m), lc_m)
            )
            eval_point_c = jnp.concatenate(
                [jnp.stack(alphas), last_coord[None]], axis=0
            )
            out.append(
                (tuple(msgs), tuple(alphas), kb.from_monty(claim_m),
                 coeffs_m, comp_c, last_coord)
            )
        return (sponge.state, sponge._buf, tuple(out), eval_point_c,
                num_m, den_m)

    meta = (kernel,)
    _GKR_MEGA[key] = meta
    return meta


def _gkr_big_layer(pair, tch, eval_point_c, num_m, den_m):
    """One large GKR layer through the per-round fused sumcheck driver
    (iop/dsumcheck.py), keeping everything on device. Returns the same
    per-layer handle tuple the mega kernel emits, plus the updated
    (eval_point, num, den) device values."""
    import sys as _sys

    from ..iop import dsumcheck as dsc

    lnum, lden = pair
    print(f"[gkr] big layer {tuple(lnum.shape)}", file=_sys.stderr, flush=True)
    lam_c = tch.sample_ext()
    lam_m = _to_monty_dev(lam_c)
    eq = _pl_jit(_to_monty_dev(eval_point_c))
    table = _build_gkr_table(eq, lnum, lden)
    poly = PackedLogupRoundPoly(table, int(table.shape[0]), lam_m, None)
    claim_m = ext.ext4_add(ext.ext4_mul(num_m, lam_m), den_m)
    deferred = dsc.device_sumcheck([poly], tch, [claim_m], lam_c)
    comp_m = deferred.component_evals[0]  # (4, 4) monty [n0, d0, n1, d1]
    comp_c = _from_monty_dev(comp_m)
    tch.observe_slice(comp_c[0])
    tch.observe_slice(comp_c[2])
    tch.observe_slice(comp_c[1])
    tch.observe_slice(comp_c[3])
    last_coord = tch.sample_ext()
    lc_m = _to_monty_dev(last_coord)
    n0m, d0m, n1m, d1m = comp_m[0], comp_m[1], comp_m[2], comp_m[3]
    num_m = ext.ext4_add(n0m, ext.ext4_mul(ext.ext4_sub(n1m, n0m), lc_m))
    den_m = ext.ext4_add(d0m, ext.ext4_mul(ext.ext4_sub(d1m, d0m), lc_m))
    point_c = jnp.stack(list(deferred.alphas))
    eval_point_c = jnp.concatenate([point_c, last_coord[None]], axis=0)
    entry = (
        tuple(deferred.messages),
        tuple(deferred.alphas),
        kb.from_monty(jnp.asarray(claim_m)),
        deferred.last_coeffs,
        comp_c,
        last_coord,
    )
    return entry, eval_point_c, num_m, den_m


def _gkr_rounds_mega(
    layers, first_eval_point, numerator_eval, denominator_eval, challenger
):
    """Mega-fused GKR rounds: one dispatch, one fetch, one writeback."""
    from ..iop.dchallenger import RATE, TraceChallenger
    from ..utils.fetch import batch_fetch

    import os as _os

    tch = TraceChallenger.from_host(challenger)
    order = list(range(len(layers) - 2, -1, -1))
    dev_layers = [(layers[j][0], layers[j][1]) for j in order]
    # Group SMALL layers by a round budget into mega kernels; layers above
    # the size cap get the per-round fused driver instead — the remote TPU
    # compiler cannot digest a 20-round unrolled program over multi-
    # million-row arrays in reasonable time.
    budget = int(_os.environ.get("SP1_TPU_GKR_ROUND_BUDGET", "24"))
    cap = 1 << int(_os.environ.get("SP1_TPU_GKR_MEGA_CAP_LOG", "22"))
    plan, cur, acc = [], [], 0  # plan entries: ("mega", [layers]) | ("big", layer)
    for pair in dev_layers:
        n = _lrows(pair[0])
        if n > cap:
            if cur:
                plan.append(("mega", cur))
                cur, acc = [], 0
            plan.append(("big", pair))
            continue
        r = n.bit_length() - 2  # rounds of this layer
        if cur and acc + r > budget:
            plan.append(("mega", cur))
            cur, acc = [], 0
        cur.append(pair)
        acc += r
    if cur:
        plan.append(("mega", cur))
    eval_point_c = jnp.asarray(np.asarray(first_eval_point, np.uint32))
    num_m = jnp.asarray(_to_monty_np(numerator_eval))
    den_m = jnp.asarray(_to_monty_np(denominator_eval))
    out = []
    with timing.span("rounds_enqueue"):
        for mode, item in plan:
            if mode == "big":
                step = _gkr_big_layer(
                    item, tch, eval_point_c, num_m, den_m
                )
                out.append(step[0])
                eval_point_c, num_m, den_m = step[1:]
                continue
            chunk = tuple(item)
            shapes = (
                tuple(tuple(l[0].shape) for l in chunk),
                int(eval_point_c.shape[0]),
            )
            (kernel,) = _gkr_mega_kernel(shapes, tch._nbuf, tch._out_left)
            import sys as _sys

            print(f"[gkr] group {shapes[0]}", file=_sys.stderr, flush=True)
            state, buf, got, eval_point_c, num_m, den_m = kernel(
                tch.state,
                tch._buf_array(),
                chunk,
                eval_point_c,
                num_m,
                den_m,
            )
            nbuf = int(buf.shape[0])
            tch.state = state
            tch._segs = [(buf, nbuf)] if nbuf else []
            tch._nbuf = nbuf
            tch._out_left = RATE - 4  # every layer ends on a sample_vec(4)
            out.extend(got)

    handles, spans = [], []
    for msgs, alphas, claim_c, coeffs_m, comp_c, last_coord in out:
        h = list(msgs) + list(alphas) + [claim_c, coeffs_m, comp_c, last_coord]
        handles.extend(h)
        spans.append((len(msgs), len(h)))
    with timing.span("fetch"):
        fetched = batch_fetch(handles)
    tch.to_host(challenger)

    from ..iop.dsumcheck import kb_from_monty_host

    round_proofs = []
    off = 0
    eval_point = None
    for n_msgs, span_len in spans:
        h = fetched[off : off + span_len]
        off += span_len
        msgs = h[:n_msgs]
        alphas = h[n_msgs : 2 * n_msgs]
        claim_c, coeffs_m, comp_c, last_coord = h[2 * n_msgs :]
        point = np.stack(alphas)
        coeffs_c = np.asarray(kb_from_monty_host(coeffs_m), np.uint32)
        final_eval = sc.uni_eval(coeffs_c[0], point[0])
        proof = sc.PartialSumcheckProof(
            univariate_polys=np.stack(msgs),
            claimed_sum=np.asarray(claim_c, np.uint32),
            point=point,
            eval=final_eval,
        )
        n0, d0, n1, d1 = comp_c[0], comp_c[1], comp_c[2], comp_c[3]
        round_proofs.append(
            LogupGkrRoundProof(
                numerator_0=n0,
                numerator_1=n1,
                denominator_0=d0,
                denominator_1=d1,
                sumcheck_proof=proof,
            )
        )
        eval_point = np.concatenate([point, last_coord[None]], axis=0)
    return round_proofs, eval_point


def _gkr_rounds_dfs(
    layers, first_eval_point, numerator_eval, denominator_eval, challenger
):
    """Device-resident GKR round loop: ONE host sync for ALL layers.

    The host loop below pays two syncs per layer (sumcheck finalize +
    challenger writeback) plus host-side claim/eval updates; here the
    per-layer sumchecks, the inter-layer transcript traffic (observing
    [n0, n1, d0, d1], sampling lam / last_coord) and the claim recurrence
    all stay on device via the TraceChallenger, and everything crosses to
    the host in one batched transfer at the end. Transcript-identical to
    the host loop (reference: crates/hypercube/src/logup_gkr/prover.rs
    round loop semantics)."""
    from ..iop import dsumcheck as dsc
    from ..iop.dchallenger import TraceChallenger
    from ..utils.fetch import batch_fetch

    import os as _os

    gkr_sync = _os.environ.get("SP1_TPU_GKR_SYNC", "0") == "1"
    tch = TraceChallenger.from_host(challenger)
    num_m = jnp.asarray(_to_monty_np(numerator_eval))
    den_m = jnp.asarray(_to_monty_np(denominator_eval))
    eval_point_c = jnp.asarray(np.asarray(first_eval_point, np.uint32))
    per_layer = []
    for layer_idx in _spanned_range(len(layers)):
        lnum, lden, _ = layers[layer_idx]
        lam_c = tch.sample_ext()
        lam_m = _to_monty_dev(lam_c)
        eq = _pl_jit(_to_monty_dev(eval_point_c))
        table = _build_gkr_table(eq, lnum, lden)
        poly = PackedLogupRoundPoly(table, int(table.shape[0]), lam_m, None)
        claim_m = ext.ext4_add(ext.ext4_mul(num_m, lam_m), den_m)
        deferred = dsc.device_sumcheck([poly], tch, [claim_m], lam_c)
        comp_m = deferred.component_evals[0]  # (4, 4) monty [n0, d0, n1, d1]
        comp_c = _from_monty_dev(comp_m)
        tch.observe_slice(comp_c[0])
        tch.observe_slice(comp_c[2])
        tch.observe_slice(comp_c[1])
        tch.observe_slice(comp_c[3])
        last_coord = tch.sample_ext()
        lc_m = _to_monty_dev(last_coord)
        n0m, d0m, n1m, d1m = comp_m[0], comp_m[1], comp_m[2], comp_m[3]
        num_m = ext.ext4_add(n0m, ext.ext4_mul(ext.ext4_sub(n1m, n0m), lc_m))
        den_m = ext.ext4_add(d0m, ext.ext4_mul(ext.ext4_sub(d1m, d0m), lc_m))
        point_c = jnp.stack(list(deferred.alphas))
        eval_point_c = jnp.concatenate([point_c, last_coord[None]], axis=0)
        per_layer.append((deferred, claim_m, comp_c, last_coord))
        if gkr_sync:  # per-layer drain timing (diagnostic only)
            with timing.span(f"sync_l{layer_idx}"):
                jax.block_until_ready(tch.state)

    handles, spans = [], []
    for deferred, claim_m, comp_c, last_coord in per_layer:
        h = deferred.handles()
        handles.extend(h + [claim_m, comp_c, last_coord])
        spans.append(len(h) + 3)
    with timing.span("drain"):
        jax.block_until_ready(tch.state)
    with timing.span("fetch"):
        fetched = batch_fetch(handles)
    tch.to_host(challenger)

    round_proofs = []
    off = 0
    eval_point = None
    for (deferred, _, _, _), span_len in zip(per_layer, spans):
        h = fetched[off : off + span_len]
        off += span_len
        proof, _ = deferred.from_fetched(h[:-3])
        proof.claimed_sum = np.asarray(
            dsc.kb_from_monty_host(h[-3]), np.uint32
        )
        comp_c = h[-2]
        last_coord = h[-1]
        n0, d0, n1, d1 = comp_c[0], comp_c[1], comp_c[2], comp_c[3]
        round_proofs.append(
            LogupGkrRoundProof(
                numerator_0=n0,
                numerator_1=n1,
                denominator_0=d0,
                denominator_1=d1,
                sumcheck_proof=proof,
            )
        )
        eval_point = np.concatenate([proof.point, last_coord[None]], axis=0)
    return round_proofs, eval_point


def prove_logup_gkr(
    machine,
    chips,
    preprocessed,
    traces,
    heights,
    public_values,
    challenger: DuplexChallenger,
    scope: str = "local",
    global_challenges=None,
) -> LogupGkrProof:
    """Reference: crates/hypercube/src/logup_gkr/prover.rs:190.

    scope="global" runs the cross-shard instance: alpha/betas are the
    shared challenges (sampled after ALL shard commitments), no grinding,
    and the output cumulative sum is bound to the public-values digest.
    """
    from ..utils import dfs

    use_dfs = dfs.enabled() and getattr(challenger, "device_traceable", False)
    if scope == "local":
        beta_seed_dim = gkr_beta_seed_dim(machine, chips, scope)
        witness = challenger.grind(GKR_GRINDING_BITS)
        alpha = challenger.sample_ext()
        beta_seed = challenger.sample_ext_vec(beta_seed_dim)
        _pv_challenge = challenger.sample_ext()
        betas = mle_ops.host.partial_lagrange_ext(beta_seed)
    else:
        witness = 0
        alpha, betas = global_challenges

    with timing.span("first_layer"):
        num, den, iv = materialize_first_layer(
            chips, preprocessed, traces, heights, alpha, betas, scope,
            force_device=use_dfs,
        )
    mlrc = int(next(iter(traces.values())).shape[0]).bit_length() - 1

    # Build all layers down to row-variables == 1. Small layers transition
    # on the host (canonical form) to avoid per-shape compiles.
    host = isinstance(num, np.ndarray)
    layers = [(num, den, host)]
    with timing.span("layer_tree"):
        if not host and use_dfs:
            # all transitions in ONE dispatch (the per-level kernels were
            # ~15 blocking launches on the remote-tunnel path)
            for n2, d2 in _layer_tree_fused(num, den, mlrc - 1):
                layers.append((n2, d2, False))
        for _ in range(mlrc - 1 if host or not use_dfs else 0):
            if not host and not use_dfs and _lrows(num) // 2 <= HOST_THRESH:
                # flat SoA -> (N, 4) AoS numpy
                num = hostmle.dev_to_host(num).reshape(4, -1).T.copy()
                den = hostmle.dev_to_host(den).reshape(4, -1).T.copy()
                host = True
            if host:
                nv = num.reshape(-1, 2, 4)
                dv = den.reshape(-1, 2, 4)
                num = E4.add(
                    E4.mul(nv[:, 0], dv[:, 1]), E4.mul(nv[:, 1], dv[:, 0])
                )
                den = E4.mul(dv[:, 0], dv[:, 1])
            else:
                num, den = _layer_transition(num, den)
            layers.append((num, den, host))

    out_num, out_den, out_host = layers[-1]  # (2^(iv+1), 4)
    if out_host:
        out_num_c = np.asarray(out_num, np.uint32)
        out_den_c = np.asarray(out_den, np.uint32)
    else:
        # flat SoA -> canonical (N, 4) AoS
        out_num_c = _from_monty_np(np.asarray(out_num)).reshape(4, -1).T.copy()
        out_den_c = _from_monty_np(np.asarray(out_den)).reshape(4, -1).T.copy()
    challenger.observe_variable_length_slice(out_num_c.reshape(-1))
    challenger.observe_variable_length_slice(out_den_c.reshape(-1))

    first_eval_point = challenger.sample_ext_vec(iv + 1)
    numerator_eval = mle_ops.host.eval_ext_mle(out_num_c, first_eval_point)
    denominator_eval = mle_ops.host.eval_ext_mle(out_den_c, first_eval_point)
    eval_point = first_eval_point

    import os as _os

    from ..parallel import mesh as pm

    dfs_rounds_done = False
    if (
        use_dfs
        and _os.environ.get("SP1_TPU_GKR_DFS", "1") != "0"
        and not any(lh for _, _, lh in layers)
    ):
        mega = (
            _os.environ.get("SP1_TPU_GKR_MEGA", "1") != "0"
            and pm.active_mesh() is None
        )
        rounds_fn = _gkr_rounds_mega if mega else _gkr_rounds_dfs
        round_proofs, eval_point = rounds_fn(
            layers, first_eval_point, numerator_eval, denominator_eval,
            challenger,
        )
        dfs_rounds_done = True
    else:
        round_proofs = []
    # Rounds process layers from second-smallest upward.
    for layer_idx in (
        _spanned_range(len(layers)) if not dfs_rounds_done else ()
    ):
        lnum, lden, lhost = layers[layer_idx]
        lam = challenger.sample_ext()
        lam_m = jnp.asarray(_to_monty_np(lam))
        if lhost or (not use_dfs and _lrows(lnum) // 2 <= HOST_THRESH):
            eq_c = mle_ops.host.partial_lagrange_ext(np.asarray(eval_point, np.uint32))
            ln = (
                np.asarray(lnum, np.uint32)
                if lhost
                else hostmle.dev_to_host(lnum).reshape(4, -1).T.copy()
            ).reshape(-1, 2, 4)
            ld = (
                np.asarray(lden, np.uint32)
                if lhost
                else hostmle.dev_to_host(lden).reshape(4, -1).T.copy()
            ).reshape(-1, 2, 4)
            poly = LogupRoundPoly(
                eq_c, ln[:, 0], ln[:, 1], ld[:, 0], ld[:, 1], lam_m, lam, host=True
            )
        else:
            eq = _pl_jit(jnp.asarray(_to_monty_np(eval_point)))
            table = _build_gkr_table(eq, lnum, lden)
            poly = PackedLogupRoundPoly(table, int(table.shape[0]), lam_m, lam)
        claim = E4.add(E4.mul(numerator_eval, lam), denominator_eval)
        if use_dfs and not poly.host:
            from ..iop import dsumcheck as dsc

            proof, comp_evals = dsc.reduce_sumcheck_to_evaluation_device(
                [poly], challenger, [claim], lam
            )
        else:
            proof, comp_evals = sc.reduce_sumcheck_to_evaluation(
                [poly], challenger, [claim], lam
            )
        n0, d0, n1, d1 = comp_evals[0]
        challenger.observe_slice(n0)
        challenger.observe_slice(n1)
        challenger.observe_slice(d0)
        challenger.observe_slice(d1)
        eval_point = proof.point
        last_coord = challenger.sample_ext()
        numerator_eval = E4.add(n0, E4.mul(E4.sub(n1, n0), last_coord))
        denominator_eval = E4.add(d0, E4.mul(E4.sub(d1, d0), last_coord))
        eval_point = np.concatenate([eval_point, last_coord[None]], axis=0)
        round_proofs.append(
            LogupGkrRoundProof(
                numerator_0=n0,
                numerator_1=n1,
                denominator_0=d0,
                denominator_1=d1,
                sumcheck_proof=proof,
            )
        )

    # Trace openings at the final point's row part.
    trace_point = eval_point[eval_point.shape[0] - mlrc :]
    tp_m = jnp.asarray(_to_monty_np(trace_point))
    host_small = (1 << mlrc) <= HOST_THRESH
    if host_small:
        eq_c = mle_ops.host.partial_lagrange_ext(trace_point)

    def _trace_eval_host(t):
        tc = hostmle.dev_to_host(t)  # (2^mlrc, W)
        prod = (
            tc[:, :, None].astype(np.uint64) * eq_c[:, None, :].astype(np.uint64)
        ) % kb.P
        return (prod.sum(axis=0) % kb.P).astype(np.uint32)

    challenger.observe(len(chips))
    with timing.span("trace_open"):
        # Evaluate every chip's main (and preprocessed) trace at the final
        # point; on device, all results cross to the host in ONE transfer.
        jobs = []  # (chip, kind) in evaluation order
        if host_small:
            results = []
            for chip in chips:
                jobs.append((chip.name, "main"))
                results.append(_trace_eval_host(traces[chip.name]))
                prep = preprocessed.get(chip.name)
                if prep is not None:
                    jobs.append((chip.name, "prep"))
                    results.append(_trace_eval_host(prep))
        else:
            handles = []
            for chip in chips:
                jobs.append((chip.name, "main"))
                handles.append(_eval_mle_jit(traces[chip.name], tp_m))
                prep = preprocessed.get(chip.name)
                if prep is not None:
                    jobs.append((chip.name, "prep"))
                    handles.append(_eval_mle_jit(prep, tp_m))
            flat = kb.from_monty(jnp.concatenate([h.reshape(-1) for h in handles]))
            flat = np.asarray(flat, np.uint32).reshape(-1, 4)
            results, off = [], 0
            for h in handles:
                w = int(h.shape[0])
                results.append(flat[off : off + w])
                off += w
    evals = {}
    for (name, kind), val in zip(jobs, results):
        evals[(name, kind)] = val
    chip_openings = {}
    for chip in chips:
        main_eval = evals[(chip.name, "main")]
        prep_eval = evals.get((chip.name, "prep"))
        if prep_eval is not None:
            challenger.observe_variable_length_slice(prep_eval.reshape(-1))
        challenger.observe_variable_length_slice(main_eval.reshape(-1))
        chip_openings[chip.name] = ChipEvaluation(
            main_trace_evaluations=main_eval,
            preprocessed_trace_evaluations=prep_eval,
        )

    cumulative = None
    if scope == "global":
        cumulative = np.zeros(4, np.uint32)
        for i in range(out_num_c.shape[0]):
            cumulative = E4.add(
                cumulative, E4.mul(out_num_c[i], E4.inv(out_den_c[i]))
            )
    return LogupGkrProof(
        numerator_output=out_num_c,
        denominator_output=out_den_c,
        round_proofs=round_proofs,
        logup_evaluations=LogUpEvaluations(
            point=trace_point, chip_openings=chip_openings
        ),
        witness=witness,
        cumulative_sum=cumulative,
    )


# ---------------------------------------------------------------------------
# Verifier (host)
# ---------------------------------------------------------------------------


def verify_logup_gkr(
    machine,
    chips,
    degrees,  # dict name -> (mlrc+1,) canonical bit array (big-endian height)
    max_log_row_count: int,
    proof: LogupGkrProof,
    public_values,
    challenger: DuplexChallenger,
    scope: str = "local",
    global_challenges=None,
) -> bool:
    """Reference: crates/hypercube/src/logup_gkr/verifier.rs:103."""
    from ..air.builder import NpOps

    if scope == "local":
        beta_seed_dim = gkr_beta_seed_dim(machine, chips, scope)
        if not challenger.check_witness(GKR_GRINDING_BITS, proof.witness):
            return False
        alpha = challenger.sample_ext()
        beta_seed = challenger.sample_ext_vec(beta_seed_dim)
        pv_challenge = challenger.sample_ext()
        betas = mle_ops.host.partial_lagrange_ext(beta_seed)

        ok, pv_digest = machine.eval_public_values(
            public_values, pv_challenge, alpha, betas
        )
        if not ok:
            return False
        cumulative_sum = E4.sub(np.zeros(4, np.uint32), pv_digest)
    else:
        alpha, betas = global_challenges
        # the proof-declared cumulative sum; bound to the transcript by the
        # output-table observation below, and checked to sum to zero across
        # shards by verify_program.
        if proof.cumulative_sum is None:
            return False
        cumulative_sum = np.asarray(proof.cumulative_sum, np.uint32)

    num_interactions = sum(len(scoped_interactions(c, scope)) for c in chips)
    iv = log2_ceil(num_interactions)
    expected_size = 1 << (iv + 1)
    numerator, denominator = proof.numerator_output, proof.denominator_output
    if numerator.shape != (expected_size, 4) or denominator.shape != (expected_size, 4):
        return False
    challenger.observe_variable_length_slice(numerator.reshape(-1))
    challenger.observe_variable_length_slice(denominator.reshape(-1))
    if any(np.all(denominator[i] == 0) for i in range(expected_size)):
        return False
    out_sum = np.zeros(4, np.uint32)
    for i in range(expected_size):
        out_sum = E4.add(out_sum, E4.mul(numerator[i], E4.inv(denominator[i])))
    if not np.array_equal(out_sum, cumulative_sum):
        return False

    first_eval_point = challenger.sample_ext_vec(iv + 1)
    numerator_eval = mle_ops.host.eval_ext_mle(numerator, first_eval_point)
    denominator_eval = mle_ops.host.eval_ext_mle(denominator, first_eval_point)
    eval_point = first_eval_point

    if len(proof.round_proofs) + 1 != max_log_row_count:
        return False

    for i, rp in enumerate(proof.round_proofs):
        lam = challenger.sample_ext()
        expected_claim = E4.add(E4.mul(numerator_eval, lam), denominator_eval)
        if not np.array_equal(rp.sumcheck_proof.claimed_sum, expected_claim):
            return False
        if not sc.partially_verify_sumcheck_proof(
            rp.sumcheck_proof, challenger, i + iv + 1, 3
        ):
            return False
        point = rp.sumcheck_proof.point
        final_eval = rp.sumcheck_proof.eval
        eq_eval = mle_ops.host.eq_points(point, eval_point)
        num_sc = E4.add(
            E4.mul(rp.numerator_0, rp.denominator_1),
            E4.mul(rp.numerator_1, rp.denominator_0),
        )
        den_sc = E4.mul(rp.denominator_0, rp.denominator_1)
        expected_final = E4.mul(eq_eval, E4.add(E4.mul(num_sc, lam), den_sc))
        if not np.array_equal(final_eval, expected_final):
            return False
        challenger.observe_slice(rp.numerator_0)
        challenger.observe_slice(rp.numerator_1)
        challenger.observe_slice(rp.denominator_0)
        challenger.observe_slice(rp.denominator_1)
        eval_point = point
        last_coord = challenger.sample_ext()
        numerator_eval = E4.add(
            rp.numerator_0, E4.mul(E4.sub(rp.numerator_1, rp.numerator_0), last_coord)
        )
        denominator_eval = E4.add(
            rp.denominator_0,
            E4.mul(E4.sub(rp.denominator_1, rp.denominator_0), last_coord),
        )
        eval_point = np.concatenate([eval_point, last_coord[None]], axis=0)

    interaction_point = eval_point[:iv]
    trace_point = eval_point[iv:]
    if trace_point.shape[0] != max_log_row_count:
        return False
    le = proof.logup_evaluations
    if not np.array_equal(le.point, trace_point):
        return False

    # Reconstruct last-layer leaf evaluations from the trace openings.
    numerator_values, denominator_values = [], []
    # add_dimension prepends at the FRONT (MSB).
    point_extended = np.concatenate(
        [np.zeros((1, 4), np.uint32), le.point], axis=0
    )
    challenger.observe(len(chips))
    ops = NpOps()
    for chip in chips:
        openings = le.chip_openings.get(chip.name)
        if openings is None:
            return False
        prep_eval = openings.preprocessed_trace_evaluations
        if prep_eval is not None:
            challenger.observe_variable_length_slice(prep_eval.reshape(-1))
            if prep_eval.shape[0] != chip.preprocessed_width:
                return False
        elif chip.preprocessed_width != 0:
            return False
        challenger.observe_variable_length_slice(
            openings.main_trace_evaluations.reshape(-1)
        )
        if openings.main_trace_evaluations.shape[0] != chip.width:
            return False
        threshold = degrees[chip.name]
        if threshold.shape[0] != point_extended.shape[0]:
            return False
        geq_eval = full_geq_host(threshold, point_extended)
        main_evals = [openings.main_trace_evaluations[i] for i in range(chip.width)]
        prep_evals = (
            [prep_eval[i] for i in range(chip.preprocessed_width)]
            if prep_eval is not None
            else []
        )
        zero_main = [ops.zero()] * chip.width
        zero_prep = [ops.zero()] * chip.preprocessed_width
        alpha_v = alpha
        betas_v = [betas[k] for k in range(betas.shape[0])]
        for inter, is_send in scoped_interactions(chip, scope):
            real_n, real_d = inter.eval(prep_evals, main_evals, alpha_v, betas_v, ops)
            pad_n, pad_d = inter.eval(zero_prep, zero_main, alpha_v, betas_v, ops)
            n_eval = E4.sub(real_n, E4.mul(pad_n, geq_eval))
            d_eval = E4.add(real_d, E4.mul(E4.sub(ops.one(), pad_d), geq_eval))
            if not is_send:
                n_eval = E4.sub(ops.zero(), n_eval)
            numerator_values.append(n_eval)
            denominator_values.append(d_eval)
    target = 1 << iv
    while len(numerator_values) < target:
        numerator_values.append(np.zeros(4, np.uint32))
        denominator_values.append(NpOps.one())
    expected_num = mle_ops.host.eval_ext_mle(
        np.stack(numerator_values), interaction_point
    )
    expected_den = mle_ops.host.eval_ext_mle(
        np.stack(denominator_values), interaction_point
    )
    if not np.array_equal(numerator_eval, expected_num):
        return False
    if not np.array_equal(denominator_eval, expected_den):
        return False
    return True
