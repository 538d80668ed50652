"""Golden-proof oracle: cross-implementation validation against real
Rust-generated artifacts without any transcript assumption (COMPAT.md;
tools/transcript_attack.py).

These tests pin the strongest cross-impl facts we can check offline:
the Merkle rules, the FRI fold/geometry and the grinding hash layout all
match the reference's stored proofs bit-for-bit.
"""

import pytest

from lambdaworks_cairo_prover_tpu.field import host as fh
from lambdaworks_cairo_prover_tpu.field.params import P
from lambdaworks_cairo_prover_tpu.hash.keccak_host import keccak256
from lambdaworks_cairo_prover_tpu.hash.merkle import verify_proof

from tools.transcript_attack import (
    grinding_ok,
    load_golden,
    recover_zetas,
)

IOTAS = [15474, 2712, 3738]  # unique brute-forced auth-path indices


@pytest.fixture(scope="module")
def golden():
    return load_golden()


def test_iotas_verify_against_layer0_tree(golden):
    proof, pub, air, domain = golden
    for iota, dec in zip(IOTAS, proof.query_list):
        leaf = keccak256(fh.to_bytes_be(dec.layers_evaluations[0]))
        assert verify_proof(
            proof.fri_layers_merkle_roots[0], iota, leaf,
            dec.layers_auth_paths[0],
        )
        # and the symmetric opening at iota + N/2
        leaf_sym = keccak256(fh.to_bytes_be(dec.layers_evaluations_sym[0]))
        assert verify_proof(
            proof.fri_layers_merkle_roots[0],
            (iota + domain.lde_size // 2) % domain.lde_size, leaf_sym,
            dec.layers_auth_paths_sym[0],
        )


def test_zetas_consistent_across_queries(golden):
    """Colinearity-recovered zetas agree for all 3 queries at all 12
    layers — the FRI geometry matches the Rust artifacts exactly.
    (recover_zetas asserts cross-query consistency internally.)"""
    proof, pub, air, domain = golden
    zetas = recover_zetas(proof, domain, IOTAS)
    assert len(zetas) == len(proof.fri_layers_merkle_roots) == 12
    assert all(0 < z < P for z in zetas)
    # the draws came through the 251-bit mask: top 5 bits clear
    assert all(z < 1 << 251 for z in zetas)


def test_attack_grid_sample_eliminates(golden):
    """A spot sample of the variant grid scores zero on the zeta oracle
    (full 12,096-variant elimination: tools/transcript_attack.py)."""
    from tools.transcript_attack import SCHEDULE_AXES, replay

    proof, pub, air, domain = golden
    zetas_gt = recover_zetas(proof, domain, IOTAS)
    base = {name: axis[0] for name, axis in SCHEDULE_AXES.items()}
    for construction in ("plain", "reverse_seed_reverse", "stream_feed"):
        zetas, gch, iotas = replay(
            air, proof, domain, construction, pub_bytes=pub.serialize(),
            **base,
        )
        assert zetas[0] != zetas_gt[0]
        assert iotas != IOTAS
