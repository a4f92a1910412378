"""Independent machine-level shard / program verification.

Mirrors the full verifier pipeline (reference:
crates/hypercube/src/verifier/shard.rs:288-430 `verify_shard` incl.
`verify_zerocheck`, crates/prover/src/verify.rs:109-260 cross-shard
chaining) over a scalar backend. Shares ONLY the machine definitions
(chips, interactions, constraint builder) with the prover — all protocol
verification logic lives in this package.

Entry points:
    verify_shard(machine, config, vk, proof, ...)   -> None or raises
    verify_program(machine, config, vk, proofs)     -> None or raises
    check_shard / check_program                     -> bool wrappers
"""

from __future__ import annotations

from ..air.builder import ConstraintFolder
from . import gkr as vgkr
from .backend import ConcreteBackend, VerificationError
from .jagged import verify_trusted_evaluations
from .mle import eq_points, full_geq
from .ops import VOps
from .sumcheck import partially_verify

MAX_CONSTRAINT_DEGREE = 3


def global_chips_of(chips):
    return [
        c for c in chips
        if any(i.scope == "global" for i in c.sends() + c.receives())
    ]


def observe_vk(vk, challenger):
    """Reference: crates/hypercube/src/verifier/config.rs:97."""
    challenger.observe_digest(vk.preprocessed_commit)
    challenger.observe_slice(vk.pc_start)
    challenger.observe_slice(vk.initial_global_cumulative_sum[:7])
    challenger.observe_slice(vk.initial_global_cumulative_sum[7:])
    challenger.observe(vk.enable_untrusted_programs)
    for _ in range(6):
        challenger.observe_const(0)


def _pv_exts(bk, public_values):
    return [bk.ext_from_felt(v) for v in public_values]


def _eval_constraints(bk, chip, prep_rows, main_rows, pv_exts, alpha):
    """Horner-in-alpha accumulation of the chip constraints at a point.

    Reference: crates/hypercube/src/verifier/shard.rs:237 eval_constraints.
    """
    ops = VOps(bk)
    folder = ConstraintFolder(ops, prep_rows, main_rows, pv_exts, alpha)
    chip.eval(folder)
    return folder.accumulator


def _padded_row_adjustment(bk, chip, pv_exts, alpha):
    ops = VOps(bk)
    zero_prep = [ops.zero()] * chip.preprocessed_width
    zero_main = [ops.zero()] * chip.width
    folder = ConstraintFolder(ops, zero_prep, zero_main, pv_exts, alpha)
    chip.eval(folder)
    return folder.accumulator


def verify_shard(bk, machine, config, vk, proof, challenger, global_ctx=None):
    """Raises VerificationError / ValueError on any failure.

    proof: a lifted VShardProof (see lift.py); vk: lifted VVerifyingKey.
    """
    mlrc = config.max_log_row_count
    public_values = proof.public_values
    if len(public_values) != machine.max_num_pvs:
        raise VerificationError("public values length mismatch")
    for v in public_values[machine.num_pv_elts():]:
        bk.assert_f_zero(v, "public values padding must be zero")

    chip_names = list(proof.opened_values.keys())
    chips = [c for c in machine.chips if c.name in chip_names]
    if len(chips) != len(chip_names) or not chips:
        raise VerificationError("unknown chips in proof")
    if [c.name for c in chips] != chip_names:
        raise VerificationError("chips out of canonical order")

    challenger.observe_slice(public_values)
    challenger.observe_digest(proof.main_commitment)
    challenger.observe_const(len(chips))
    degrees = {}
    for name, ov in proof.opened_values.items():
        bits = ov.degree
        if len(bits) != mlrc + 1 or len(bits) >= 30:
            raise VerificationError("degree bit-length out of range")
        if any(b not in (0, 1) for b in bits):
            raise VerificationError("degree bits must be boolean")
        if bits[0] == 1 and any(bits[1:]):
            raise VerificationError("height exceeds 2^mlrc")
        height = 0
        for b in bits:
            height = b + 2 * height
        degrees[name] = bits
        challenger.observe_const(height)
        challenger.observe_const(len(name))
        for b in name.encode():
            challenger.observe_const(b)

    # GKR verification.
    if len(proof.logup_gkr_proof.chip_openings) != len(chips):
        raise VerificationError("gkr opening count mismatch")
    zeta = vgkr.verify_logup_gkr(
        bk, machine, chips, degrees, mlrc, proof.logup_gkr_proof,
        public_values, challenger,
    )

    # Global (cross-shard) GKR verification.
    g_chips = global_chips_of(chips)
    zeta2 = None
    if g_chips:
        if proof.global_gkr_proof is None:
            raise VerificationError("missing global gkr proof")
        if global_ctx is None:
            dim = vgkr.gkr_beta_seed_dim(machine, g_chips, "global")
            alpha_g = challenger.sample_ext()
            seed_g = challenger.sample_ext_vec(dim)
            from .mle import partial_lagrange

            betas_g = partial_lagrange(bk, seed_g)
        else:
            alpha_g, betas_g = global_ctx
        g_degrees = {c.name: degrees[c.name] for c in g_chips}
        zeta2 = vgkr.verify_logup_gkr(
            bk, machine, g_chips, g_degrees, mlrc, proof.global_gkr_proof,
            public_values, challenger, scope="global",
            global_challenges=(alpha_g, betas_g),
        )
    elif proof.global_gkr_proof is not None:
        raise VerificationError("unexpected global gkr proof")

    # Zerocheck verification.
    zc_point = _verify_zerocheck(
        bk, machine, chips, g_chips, proof, public_values, zeta, zeta2,
        mlrc, challenger,
    )

    # Bind the jagged layout row counts to the opened degrees (static).
    rc_cc = proof.evaluation_proof.row_counts_and_column_counts
    if len(rc_cc) != 2:
        raise VerificationError("expected two pcs rounds")
    main_rc = rc_cc[1]
    if len(main_rc) != len(chips) + 2:
        raise VerificationError("main round layout size mismatch")
    for i, chip in enumerate(chips):
        height = 0
        for b in proof.opened_values[chip.name].degree:
            height = b + 2 * height
        if main_rc[i][0] != height or main_rc[i][1] != chip.width:
            raise VerificationError("jagged layout does not match degrees")

    prep_claims = [
        proof.opened_values[c.name].preprocessed
        for c in chips
        if c.preprocessed_width > 0
    ]
    if not prep_claims:
        prep_claims = [[bk.zero_ext()]]  # dummy table
    main_claims = [proof.opened_values[c.name].main for c in chips]
    verify_trusted_evaluations(
        bk,
        [vk.preprocessed_commit, proof.main_commitment],
        zc_point,
        [prep_claims, main_claims],
        proof.evaluation_proof,
        config,
        challenger,
    )


def _verify_zerocheck(bk, machine, chips, g_chips, proof, public_values,
                      zeta, zeta2, mlrc, challenger):
    """Reference: crates/hypercube/src/verifier/shard.rs:288."""
    alpha = challenger.sample_ext()
    gkr_batch_challenge = challenger.sample_ext()
    gkr2_batch_challenge = challenger.sample_ext() if g_chips else None
    lam = challenger.sample_ext()

    if len(zeta) != mlrc:
        raise VerificationError("gkr point dimension mismatch")
    zc_point = partially_verify(
        bk, proof.zerocheck_proof, challenger, mlrc, MAX_CONSTRAINT_DEGREE + 1
    )
    zerocheck_eq_val = eq_points(bk, zeta, zc_point)
    pv_exts = _pv_exts(bk, public_values)

    rlc_eval = bk.zero_ext()
    for chip in chips:
        ov = proof.opened_values[chip.name]
        if len(ov.preprocessed) != chip.preprocessed_width:
            raise VerificationError("opened preprocessed width mismatch")
        if len(ov.main) != chip.width:
            raise VerificationError("opened main width mismatch")
        # add_dimension prepends a zero at the FRONT (MSB).
        point_extended = [bk.zero_ext()] + zc_point
        geq_val = full_geq(bk, ov.degree, point_extended)
        adj = _padded_row_adjustment(bk, chip, pv_exts, alpha)
        constraint_eval = _eval_constraints(
            bk, chip, ov.preprocessed, ov.main, pv_exts, alpha
        )
        constraint_eval = bk.esub(constraint_eval, bk.emul(adj, geq_val))
        batch = bk.zero_ext()
        p = gkr_batch_challenge
        for e in ov.main + ov.preprocessed:
            batch = bk.eadd(batch, bk.emul(e, p))
            p = bk.emul(p, gkr_batch_challenge)
        chip_term = bk.emul(zerocheck_eq_val, bk.eadd(constraint_eval, batch))
        rlc_eval = bk.eadd(bk.emul(rlc_eval, lam), chip_term)

    # Binding terms for the global GKR openings at zeta2.
    if g_chips:
        eq2_val = eq_points(bk, zeta2, zc_point)
        for chip in g_chips:
            ov = proof.opened_values[chip.name]
            batch2 = bk.zero_ext()
            pgk = gkr2_batch_challenge
            for e in ov.main + ov.preprocessed:
                batch2 = bk.eadd(batch2, bk.emul(e, pgk))
                pgk = bk.emul(pgk, gkr2_batch_challenge)
            rlc_eval = bk.eadd(
                bk.emul(rlc_eval, lam), bk.emul(eq2_val, batch2)
            )

    bk.assert_e_eq(proof.zerocheck_proof.eval, rlc_eval, "zerocheck rlc identity")

    # claimed sum must equal the lambda-Horner of the gkrc-batched GKR evals
    mods = []
    for chip in chips:
        main_evals, prep_evals = proof.logup_gkr_proof.chip_openings[chip.name]
        evals = list(main_evals)
        if prep_evals is not None:
            evals += list(prep_evals)
        m = bk.zero_ext()
        p = gkr_batch_challenge
        for e in evals:
            m = bk.eadd(m, bk.emul(e, p))
            p = bk.emul(p, gkr_batch_challenge)
        mods.append(m)
    if g_chips:
        for chip in g_chips:
            main2, prep2 = proof.global_gkr_proof.chip_openings[chip.name]
            evals2 = list(main2)
            if prep2 is not None:
                evals2 += list(prep2)
            m2 = bk.zero_ext()
            pgk = gkr2_batch_challenge
            for e in evals2:
                m2 = bk.eadd(m2, bk.emul(e, pgk))
                pgk = bk.emul(pgk, gkr2_batch_challenge)
            mods.append(m2)
    expected_claim = bk.zero_ext()
    for m in mods:
        expected_claim = bk.eadd(bk.emul(expected_claim, lam), m)
    bk.assert_e_eq(
        proof.zerocheck_proof.claimed_sum, expected_claim, "zerocheck claimed sum"
    )

    challenger.observe_const(len(chips))
    for chip in chips:
        ov = proof.opened_values[chip.name]
        challenger.observe_variable_length_ext_slice(ov.preprocessed)
        challenger.observe_variable_length_ext_slice(ov.main)
    return zc_point


def verify_program(bk, machine, config, vk, proofs, pv_layout):
    """Multi-shard chain verification (reference:
    crates/prover/src/verify.rs:109-260 public-values chaining + the
    septic-digest global argument, crates/hypercube/src/septic_digest.rs).

    pv_layout: object exposing PV_PC_START / PV_NEXT_PC / PV_CLK_START /
    PV_CLK_END / PV_IS_HALTED / PV_GLOBAL_COUNT / PV_GLOBAL_SUM index
    attributes (the riscv machine module).
    """
    from .challenger import VChallenger

    if not proofs:
        raise VerificationError("empty proof list")

    # Shards are transcript-independent: each verifies standalone.
    for proof in proofs:
        ch = VChallenger(bk)
        observe_vk(vk, ch)
        verify_shard(bk, machine, config, vk, proof, ch)

    # Septic digest values must cancel across shards (every global send
    # matched by exactly one receive). Points are extracted to canonical
    # integers; the in-circuit septic gadget arrives with the compose
    # stage over multi-shard proofs.
    from ..field import septic

    total = septic.CompletePoint.infinity()
    for proof in proofs:
        pv = proof.public_values
        count = bk.felt_value(pv[pv_layout.PV_GLOBAL_COUNT])
        if count == 0:
            continue
        coords = [
            bk.felt_value(pv[pv_layout.PV_GLOBAL_SUM + k]) for k in range(14)
        ]
        point = septic.SepticCurvePoint(
            septic.Septic(coords[:7]), septic.Septic(coords[7:])
        )
        if not point.check_on_curve():
            raise VerificationError("global digest not on curve")
        total = total + septic.digest_value(point)
    if not (total == septic.CompletePoint.infinity()):
        raise VerificationError("global septic digest must vanish")

    # Deferred precompile shards (zero CPU-class rows; the chip set is
    # bound by the commitment so this is prover-unforgeable) sit outside
    # the pc/clk chain; their state-slot PVs must be degenerate.
    # Reference role: controller/precompiles.rs deferred shards.
    cpu_names = {c.name for c in machine.chips if c.name.startswith("Cpu")}
    chain = []
    for proof in proofs:
        if any(n in proof.opened_values for n in cpu_names):
            chain.append(proof)
            continue
        pv = proof.public_values
        for slot, label in (
            (pv_layout.PV_PC_START, "px pc_start"),
            (pv_layout.PV_NEXT_PC, "px next_pc"),
            (pv_layout.PV_CLK_START, "px clk_start"),
            (pv_layout.PV_CLK_END, "px clk_end"),
            (pv_layout.PV_IS_HALTED, "px halted"),
        ):
            bk.assert_f_eq(pv[slot], bk.felt(0), label)
        if "MemoryGenesis" in proof.opened_values:
            raise VerificationError("genesis bookend in precompile shard")
        if "MemoryFinalGlobal" in proof.opened_values:
            raise VerificationError("final-global bookend in precompile shard")
    if not chain:
        raise VerificationError("no execution shards")

    # Public-values chaining over the execution shards.
    for i, proof in enumerate(chain):
        pv = proof.public_values
        if i == 0:
            bk.assert_f_eq(
                pv[pv_layout.PV_PC_START], vk.pc_start[0], "first shard pc"
            )
            bk.assert_f_eq(pv[pv_layout.PV_CLK_START], bk.felt(1), "first clk")
        else:
            prev = chain[i - 1].public_values
            bk.assert_f_eq(
                pv[pv_layout.PV_PC_START], prev[pv_layout.PV_NEXT_PC], "pc chain"
            )
            bk.assert_f_eq(
                pv[pv_layout.PV_CLK_START], prev[pv_layout.PV_CLK_END], "clk chain"
            )
        is_last = i == len(chain) - 1
        bk.assert_f_eq(
            pv[pv_layout.PV_IS_HALTED],
            bk.felt(1 if is_last else 0),
            "halt flag",
        )
        has_genesis = "MemoryGenesis" in proof.opened_values
        has_final_global = "MemoryFinalGlobal" in proof.opened_values
        if has_genesis != (i == 0):
            raise VerificationError("genesis bookend misplaced")
        if has_final_global != is_last:
            raise VerificationError("final-global bookend misplaced")


# ---------------------------------------------------------------------------
# Concrete-mode convenience wrappers
# ---------------------------------------------------------------------------


def check_shard(machine, config, vk, proof, verbose: bool = False) -> bool:
    """Standalone acceptance oracle for one (concrete) shard proof."""
    from .challenger import VChallenger
    from .lift import lift_shard_proof, lift_vk

    bk = ConcreteBackend()
    vvk = lift_vk(bk, vk)
    vproof = lift_shard_proof(bk, proof)
    ch = VChallenger(bk)
    observe_vk(vvk, ch)
    try:
        verify_shard(bk, machine, config, vvk, vproof, ch)
        return True
    except VerificationError as e:
        if verbose:
            print(f"[verifier] rejected: {e}")
        return False


def check_program(machine, config, vk, proofs, pv_layout=None, verbose: bool = False) -> bool:
    """Standalone acceptance oracle for a (concrete) multi-shard proof."""
    from ..riscv import machine as riscv_machine
    from .lift import lift_shard_proof, lift_vk

    bk = ConcreteBackend()
    vvk = lift_vk(bk, vk)
    vproofs = [lift_shard_proof(bk, p) for p in proofs]
    try:
        verify_program(
            bk, machine, config, vvk, vproofs, pv_layout or riscv_machine
        )
        return True
    except VerificationError as e:
        if verbose:
            print(f"[verifier] rejected: {e}")
        return False
