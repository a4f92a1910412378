"""BN254 outer field, Poseidon2 width-3 permutation, MultiField32
challenger, and the gnark constraint-JSON export."""

import json

import numpy as np

from sp1_tpu.field import bn254
from sp1_tpu.iop.multifield import MultiField32Challenger


def test_poseidon2_bn254_known_vector():
    """Horizen Labs poseidon2_instance_bn256 test vector for input
    (0, 1, 2) — byte parity with the reference's outer_perm()."""
    out = bn254.permute([0, 1, 2])
    assert out == [
        0x0BB61D24DACA55EEBCB1929A82650F328134334DA98EA4F847F760054F4A3033,
        0x303B6F7C86D043BFCBCC80214F26A30277A15D3F74CA654992DEFE7FF8D03570,
        0x1ED25194542B12EEF8617361C3BA7C52E660B145994427CC86296242CF766EC8,
    ]


def test_outer_compress():
    d = bn254.compress([123], [456])
    assert 0 <= d < bn254.P
    assert d == bn254.permute([123, 456, 0])[0]


def test_multifield_challenger_determinism():
    a, b = MultiField32Challenger(), MultiField32Challenger()
    for v in range(40):
        a.observe(v * 7 + 1)
        b.observe(v * 7 + 1)
    assert a.sample() == b.sample()
    assert list(a.sample_ext()) == list(b.sample_ext())
    # duplexing happened (16 absorbed felts per duplex)
    assert a.state != [0, 0, 0]


def test_multifield_challenger_sampling_structure():
    ch = MultiField32Challenger()
    ch.observe(42)
    s = [ch.sample() for _ in range(9)]
    # all valid KoalaBear values, and not all equal
    from sp1_tpu.field import koalabear as kb

    assert all(0 <= v < kb.P for v in s)
    assert len(set(s)) > 1


def test_multifield_grind():
    ch = MultiField32Challenger()
    ch.observe(7)
    w = ch.grind(8)
    # verifier side
    vch = MultiField32Challenger()
    vch.observe(7)
    assert vch.check_witness(8, w)


def test_gnark_constraint_export(tmp_path):
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    import test_machine as tmach
    from sp1_tpu.iop.challenger import DuplexChallenger
    from sp1_tpu.prover import machine as mm
    from sp1_tpu.recursion import compile as rcompile
    from sp1_tpu.recursion import gnark

    machine = tmach.build_machine()
    traces, prep = tmach.build_traces()
    prover = mm.ShardProver(machine, tmach.CONFIG)
    pk = prover.setup(preprocessed_traces=prep)
    ch = DuplexChallenger()
    pk.vk.observe_into(ch)
    proof = prover.prove_shard(pk, traces, [], ch)
    program = rcompile.build_shard_verify_program(machine, tmach.CONFIG, proof)
    stream = rcompile.shard_witness_stream(pk.vk, proof)
    cpath, wpath = tmp_path / "constraints.json", tmp_path / "witness.json"
    gnark.write_gnark_artifacts(program, stream, cpath, wpath)
    blob = json.loads(cpath.read_text())
    wit = json.loads(wpath.read_text())
    assert blob["num_cells"] == program.num_cells
    assert len(blob["constraints"]) >= len(program.exec_order)
    ops = {c["opcode"] for c in blob["constraints"]}
    assert "PermuteKoalaBear" in ops and "WitnessF" in ops
    assert len(wit["felts"]) == len(stream)
