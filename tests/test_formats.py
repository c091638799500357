"""I/O dialect tests: write→read roundtrips plus parsing of handcrafted
samples in the reference's exact dialects (reference src/IO/xyz.jl,
exyz.jl, lammps.jl)."""

import numpy as np
import pytest

from particlesmc_tpu.io import formats as F

from .helpers import load_fixture

# Handcrafted samples in the reference dialects (structures match the
# reference fixture headers, e.g. test/config_0.xyz:1-3).
XYZ_SAMPLE = """3
columns:species,position dt:1 cell:10.0,10.0 rho:0.03 T:0.5 Model:JBB
3 -1.5 2.25
1 0.5 -0.75
2 3.125 4.5
"""

EXYZ_SAMPLE = """3
Lattice="10.0 0.0 0.0 0.0 10.0 0.0 0.0 0.0 0.0" Properties=species:S:1:pos:R:2 Time=0
3 -1.5 2.25
1 0.5 -0.75
2 3.125 4.5
"""

LAMMPS_SAMPLE = """ITEM: TIMESTEP
0
ITEM: NUMBER OF ATOMS
3
ITEM: BOX BOUNDS pp pp pp
-5.0 5.0
-5.0 5.0
-0.1 0.1
ITEM: ATOMS type x y
3 -1.5 2.25
1 0.5 -0.75
2 3.125 4.5
"""

MOL_XYZ_SAMPLE = """4
columns:molecule,species,position dt:1 cell:8.0,8.0,8.0 rho:0.0078 T:1.0 model:GeneralKG
1 1 0.0 0.0 0.0
1 2 1.0 0.0 0.0
2 1 4.0 4.0 4.0
2 2 5.0 4.0 4.0
2
columns:bond
1 2
3 4
"""


def test_parse_xyz_sample():
    cfg = F.read_xyz(XYZ_SAMPLE)
    assert cfg["N"] == 3 and cfg["d"] == 2
    np.testing.assert_allclose(cfg["box"], [10.0, 10.0])
    np.testing.assert_array_equal(cfg["species"], [3, 1, 2])
    np.testing.assert_allclose(cfg["position"][2], [3.125, 4.5])


def test_parse_exyz_sample():
    cfg = F.read_exyz(EXYZ_SAMPLE)
    assert cfg["N"] == 3 and cfg["d"] == 2
    np.testing.assert_allclose(cfg["box"], [10.0, 10.0])
    np.testing.assert_array_equal(cfg["species"], [3, 1, 2])


def test_parse_lammps_sample():
    cfg = F.read_lammps(LAMMPS_SAMPLE)
    assert cfg["N"] == 3 and cfg["d"] == 2
    np.testing.assert_allclose(cfg["box"], [10.0, 10.0])
    np.testing.assert_array_equal(cfg["species"], [3, 1, 2])
    np.testing.assert_allclose(cfg["position"][0], [-1.5, 2.25])


def test_parse_molecular_xyz_with_bonds():
    cfg = F.read_xyz(MOL_XYZ_SAMPLE)
    assert cfg["N"] == 4
    np.testing.assert_array_equal(cfg["molecule"], [1, 1, 2, 2])
    np.testing.assert_array_equal(cfg["bond_pairs"], [[1, 2], [3, 4]])


def test_three_dialects_agree_on_fixture():
    """Same config written in all three dialects parses identically —
    the reference's loader-parity property (test/runtests.jl:28-32)."""
    fx = load_fixture("config_0.npz")
    sp = fx["species"]
    pos = fx["position"]
    box = fx["box"]
    xyz = F.write_xyz_frame(sp, pos, box, 0, fx["density"], fx["temperature"])
    exyz = F.write_exyz_frame(sp, pos, box, 0)
    lmp = F.write_lammps_frame(sp, pos, box, 0)
    a, b, c = F.read_xyz(xyz), F.read_exyz(exyz), F.read_lammps(lmp)
    for cfg in (b, c):
        assert cfg["N"] == a["N"]
        np.testing.assert_allclose(cfg["box"], a["box"], rtol=1e-12)
        np.testing.assert_array_equal(cfg["species"], a["species"])
        np.testing.assert_allclose(cfg["position"], a["position"], atol=1e-6)


def test_molecular_roundtrip_with_bonds():
    fx = load_fixture("molecule.npz")
    text = F.write_xyz_frame(
        fx["species"], fx["position"], fx["box"], 5, fx["density"], fx["temperature"],
        molecule=fx["molecule"], bond_pairs=fx["bond_pairs"],
    )
    back = F.read_xyz(text)
    np.testing.assert_array_equal(back["molecule"], fx["molecule"])
    np.testing.assert_array_equal(back["bond_pairs"], fx["bond_pairs"])
    text_e = F.write_exyz_frame(
        fx["species"], fx["position"], fx["box"], 5,
        molecule=fx["molecule"], bond_pairs=fx["bond_pairs"],
    )
    back_e = F.read_exyz(text_e)
    np.testing.assert_array_equal(back_e["bond_pairs"], fx["bond_pairs"])


def test_multiframe_trajectory():
    fx = load_fixture("config_0.npz")
    frames = "".join(
        F.write_xyz_frame(fx["species"], fx["position"] + t, fx["box"], t, 1.0, 1.0)
        for t in range(3)
    )
    f2 = F.read_xyz(frames, frame=2)
    np.testing.assert_allclose(f2["position"], fx["position"] + 2, atol=1e-6)


def test_read_trajectory_all_frames(tmp_path):
    fx = load_fixture("config_0.npz")
    for fmt, ext in (("xyz", ".xyz"), ("exyz", ".exyz")):
        p = tmp_path / f"traj{ext}"
        frames = "".join(
            F.write_frame(
                fmt,
                species=fx["species"],
                position=fx["position"] + t,
                box=fx["box"],
                step=5 * t,
                rho=1.0,
                T=1.0,
            )
            for t in range(4)
        )
        p.write_text(frames)
        out = F.read_trajectory(str(p))
        assert [fr["step"] for fr in out] == [0, 5, 10, 15]
        np.testing.assert_allclose(out[3]["position"], fx["position"] + 3, atol=1e-5)


def test_lammps_bonds_unsupported():
    with pytest.raises(F.FormatError):
        F.write_lammps_frame([1, 2], np.zeros((2, 3)), np.ones(3), 0, bond_pairs=[(1, 2)])


def test_format_dispatch():
    assert F.format_for_path("a/b/c.xyz") == "xyz"
    assert F.format_for_path("x.exyz") == "exyz"
    assert F.format_for_path("x.lmp") == "lammps"
    assert F.format_for_path("x.lammpstrj") == "lammps"
    with pytest.raises(F.FormatError):
        F.format_for_path("x.pdb")
