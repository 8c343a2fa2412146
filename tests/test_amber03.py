"""amber03-scale modelling gate (VERDICT round-1 item 4).

The reference ships src/data/amber03.xml (1957 atom types, 113 residues,
lj14scale/coulomb14scale at amber03.xml:7354) but exercises it nowhere.
These tests parse the real mounted file (read-only), assert the golden
counts, and run the full typing + bonded-assignment pipeline on a
multi-residue peptide — the disambiguation and improper machinery at the
scale it was built for.
"""

import os
import time

import numpy as np
import pytest

AMBER03 = "/root/reference/src/data/amber03.xml"

pytestmark = pytest.mark.skipif(
    not os.path.exists(AMBER03), reason="amber03.xml not mounted"
)


@pytest.fixture(scope="module")
def amber03():
    from emdee_tpu.modelling.forcefield import ForceField

    t0 = time.perf_counter()
    ff = ForceField(AMBER03)
    ff._parse_seconds = time.perf_counter() - t0
    return ff


def test_amber03_golden_counts(amber03):
    # Counts verified directly against the mounted XML (grep of <Type>,
    # <Residue>, force rows).
    assert len(amber03.atom_types) == 1957
    assert len(amber03.templates) == 113  # amber03 declares no patches
    assert len(amber03.bond_types) == 115
    assert len(amber03.angle_types) == 282
    assert len(amber03.dihedral_types) == 121
    assert len(amber03.improper_types) == 38
    assert amber03.lj14_scale == pytest.approx(0.5)
    assert amber03.coulomb14_scale == pytest.approx(0.833333)
    assert len(amber03.nonbonded) == 1957
    # Host-side setup must stay interactive (VERDICT: "a few seconds").
    assert amber03._parse_seconds < 10.0


def _ala3_pdb(path):
    """Standard-record ALA-ALA-ALA with PDB-conventional atom names: the
    N-terminus carries H1/H2/H3, the C-terminus OXT — exactly the graphs of
    amber03's NALA / ALA / CALA templates."""
    residues = [
        ("ALA", 1, ["N", "H1", "H2", "H3", "CA", "HA", "CB", "HB1", "HB2", "HB3", "C", "O"]),
        ("ALA", 2, ["N", "H", "CA", "HA", "CB", "HB1", "HB2", "HB3", "C", "O"]),
        ("ALA", 3, ["N", "H", "CA", "HA", "CB", "HB1", "HB2", "HB3", "C", "O", "OXT"]),
    ]
    lines = ["CRYST1   40.000   40.000   40.000  90.00  90.00  90.00 P 1           1"]
    serial = 0
    rng = np.random.default_rng(0)
    for resname, resid, names in residues:
        base = np.array([3.8 * (resid - 1) + 5.0, 5.0, 5.0])
        for name in names:
            serial += 1
            x, y, z = base + rng.uniform(-1.2, 1.2, 3)
            element = name[0]
            lines.append(
                f"ATOM  {serial:5d} {name:<4s} {resname:<3s} A{resid:4d}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00          {element:>2s}"
            )
    lines.append("END")
    path.write_text("\n".join(lines) + "\n")
    return sum(len(r[2]) for r in residues)


def test_ala_tripeptide_typing(amber03, tmp_path):
    from emdee_tpu.modelling.system import System

    pdb = tmp_path / "ala3.pdb"
    n_expected = _ala3_pdb(pdb)
    t0 = time.perf_counter()
    system = System(str(pdb), amber03)
    build_s = time.perf_counter() - t0

    assert len(system) == n_expected
    assert system.count_residues() == 3
    assert all(system.ff_types), "every atom must receive a force-field type"
    # Terminal residues matched the terminal templates: their CA types differ
    # from mid-chain ALA's (719-726 block is NALA; see amber03.xml:4559).
    ca_types = [
        system.ff_types[i] for i, nm in enumerate(system.names) if nm == "CA"
    ]
    assert len(ca_types) == 3 and len(set(ca_types)) == 3
    # Zwitterionic tripeptide: integer total charge 0.
    assert abs(float(system.charges.sum())) < 1e-3
    # Peptide bonds perceived across residues: intra (11+9+10) + 2 backbone.
    assert len(system.bonds) == (12 - 1) + (10 - 1) + (11 - 1) + 2
    assert build_s < 10.0


def test_ala_tripeptide_bonded_assignment(amber03, tmp_path):
    from emdee_tpu.modelling.bonded import build_bonded_system
    from emdee_tpu.modelling.system import System

    pdb = tmp_path / "ala3.pdb"
    _ala3_pdb(pdb)
    system = System(str(pdb), amber03)
    t0 = time.perf_counter()
    bonded = build_bonded_system(system, amber03, length_scale=10.0)
    assign_s = time.perf_counter() - t0

    n_bonds = int(np.sum(np.asarray(bonded.bonds.valid)))
    n_angles = int(np.sum(np.asarray(bonded.angles.valid)))
    n_torsions = int(np.sum(np.asarray(bonded.torsions.valid)))
    n_impropers = int(np.sum(np.asarray(bonded.impropers.valid))) if bonded.impropers else 0
    assert n_bonds == len(system.bonds)
    # Angle/torsion enumeration over the peptide graph: every angle must
    # receive parameters in a complete protein FF.
    # 57 = Σ_j deg(j)(deg(j)−1)/2 over the peptide graph.
    assert n_angles == 57
    # 74 = Σ_{(j,k) bonds} (deg(j)−1)(deg(k)−1): every i-j-k-l path is
    # parameterized (amber03 wildcards cover all classes).
    assert n_torsions == 74
    # Amber impropers exist for every peptide-bond carbonyl C and amide N
    # with 3 neighbors: C1, N2, C2, N3, C3 → at least 4 matched rows.
    assert n_impropers >= 4
    # Improper central atom sits THIRD in the evaluation quad (Amber layout):
    # every improper quad's position-3 atom must have ≥3 bonded neighbors.
    nbr_count = np.zeros(len(system) + 1, int)
    for a, b in system.bonds:
        nbr_count[a] += 1
        nbr_count[b] += 1
    quads = np.asarray(bonded.impropers.atoms)[:n_impropers]
    assert (nbr_count[quads[:, 2]] >= 3).all()
    assert assign_s < 20.0


def test_disambiguation_path(amber03, tmp_path):
    """Residues matching multiple templates must raise with a helpful error
    and accept an explicit disambiguation choice.  amber03's templates are
    graph-distinct, so the degenerate pair is synthesized by duplicating the
    matched template under another name."""
    from emdee_tpu.modelling.system import System, build_system

    pdb = tmp_path / "ala3.pdb"
    _ala3_pdb(pdb)
    system = System(str(pdb), amber03)
    mid_template = None
    for name, tpl in amber03.templates.items():
        if name == "ALA":
            mid_template = tpl
    assert mid_template is not None

    import copy

    ff2 = copy.copy(amber03)
    ff2.templates = dict(amber03.templates)
    ff2.templates["ALA_DUP"] = mid_template
    ff2._template_index = {
        k: list(v) for k, v in amber03._template_index.items()
    }
    key = (
        mid_template.num_atoms,
        np.packbits(mid_template.adjacency).tobytes(),
        mid_template.canonical_masses,
    )
    ff2._template_index[key] = ff2._template_index[key] + ["ALA_DUP"]

    with pytest.raises(ValueError, match="multiple templates"):
        build_system(str(pdb), ff2)
    resolved = build_system(str(pdb), ff2, disambiguation={2: "ALA_DUP"})
    assert len(resolved) == len(system)
