"""Convert reference test configurations into binary npz fixtures.

Run once against a checkout of the reference (data files only — coordinates,
species, bonds); the repo's tests then run standalone from tests/fixtures/.

Usage: python tools/make_fixtures.py [/path/to/reference]
"""

import sys

import numpy as np

sys.path.insert(0, ".")
from particlesmc_tpu.io import formats  # noqa: E402

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"


def save_atomic():
    cfg = formats.read_configuration(f"{REF}/test/config_0.xyz")
    np.savez_compressed(
        "tests/fixtures/config_0.npz",
        position=cfg["position"],
        species=cfg["species"],
        box=cfg["box"],
        temperature=0.231,
        density=cfg["N"] / np.prod(cfg["box"]),
        model="JBB",
        golden_energy_per_particle=-2.676832,
    )
    print("atomic fixture: N", cfg["N"], "d", cfg["d"])


def save_molecular():
    cfg = formats.read_configuration(f"{REF}/test/molecule.xyz")
    np.savez_compressed(
        "tests/fixtures/molecule.npz",
        position=cfg["position"],
        species=cfg["species"],
        molecule=cfg["molecule"],
        bond_pairs=cfg["bond_pairs"],
        box=cfg["box"],
        temperature=2.0,
        density=cfg["N"] / np.prod(cfg["box"]),
        model="Trimer",
        golden_energy_per_particle=25.65865662277199,
    )
    print("molecular fixture: N", cfg["N"], "d", cfg["d"])


def save_movie():
    cfg = formats.read_configuration(f"{REF}/examples/movie/inputframe.exyz")
    np.savez_compressed(
        "tests/fixtures/movie_inputframe.npz",
        position=cfg["position"],
        species=cfg["species"],
        box=cfg["box"],
        temperature=1.0,
        density=1.19206,
        model="JBB",
    )
    print("movie fixture: N", cfg["N"], "d", cfg["d"])


if __name__ == "__main__":
    import os

    os.makedirs("tests/fixtures", exist_ok=True)
    save_atomic()
    save_molecular()
    save_movie()
