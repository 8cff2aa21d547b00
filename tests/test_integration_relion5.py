"""End-to-end integration: mock micrograph -> CryoSPARC .cs -> helicon
conversion -> RELION 5.0 extraction (mirrors the reference's
tests/test_integration_relion5.py; SURVEY.md section 4's
skip-if-unavailable idiom).

Verifies the coordinate-origin convention survives the .cs -> .star
conversion: RELION extracts boxes at the planted particle positions
(cross-correlation ~1 against ground truth). Skipped unless a
relion-5.0 conda env with relion_preprocess exists.
"""

import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

N = 4
H, W = 200, 400
BOX = 48
APIX = 1.0
RELION_ENV = "relion-5.0"

CS_FRACS = np.array(
    [[0.15, 0.20], [0.35, 0.45], [0.65, 0.55], [0.85, 0.80]]
)


def _relion_available():
    if shutil.which("conda") is None:
        return False
    try:
        r = subprocess.run(
            ["conda", "run", "-n", RELION_ENV, "which", "relion_preprocess"],
            capture_output=True, text=True, timeout=30,
        )
        return r.returncode == 0
    except (subprocess.TimeoutExpired, FileNotFoundError):
        return False


@pytest.mark.skipif(
    not _relion_available(), reason="relion-5.0 conda env not available"
)
def test_cs_to_relion_extraction_convention(tmp_path):
    from helicon_tpu.io.cs import write_cs
    from helicon_tpu.io.metadata import images2dataframe, dataframe2star
    from helicon_tpu.io.mrc import read_mrc, write_mrc

    rng = np.random.default_rng(0)
    mic = rng.normal(0, 0.05, (H, W)).astype(np.float32)
    truths = []
    for fy, fx in CS_FRACS[:, ::-1]:  # (x_frac, y_frac) rows
        cx, cy = int(fx * W), int(fy * H)
        mic[cy - 4 : cy + 4, cx - 4 : cx + 4] += 2.0
        truths.append((cx, cy))
    (tmp_path / "mics").mkdir()
    write_mrc(tmp_path / "mics" / "m1.mrc", mic, apix=APIX)

    arr = np.zeros(
        N,
        dtype=[
            ("uid", "<u8"), ("blob/idx", "<u4"), ("blob/path", "S30"),
            ("blob/psize_A", "<f4"),
            ("location/micrograph_path", "S30"),
            ("location/center_x_frac", "<f4"),
            ("location/center_y_frac", "<f4"),
            ("location/micrograph_shape", "<u4", (2,)),
        ],
    )
    arr["uid"] = np.arange(N) + 1
    arr["blob/idx"] = np.arange(N)
    arr["blob/path"] = b"mics/m1.mrc"
    arr["blob/psize_A"] = APIX
    arr["location/micrograph_path"] = b"mics/m1.mrc"
    arr["location/center_x_frac"] = CS_FRACS[:, 1]
    arr["location/center_y_frac"] = CS_FRACS[:, 0]
    arr["location/micrograph_shape"] = (H, W)
    write_cs(tmp_path / "particles.cs", arr)

    df = images2dataframe(
        str(tmp_path / "particles.cs"), target_convention="relion"
    )
    dataframe2star(df, tmp_path / "particles.star")

    r = subprocess.run(
        ["conda", "run", "-n", RELION_ENV, "relion_preprocess",
         "--coord_list", "particles.star", "--part_star", "out.star",
         "--part_dir", "Extract", "--extract", "--extract_size", str(BOX)],
        capture_output=True, text=True, cwd=tmp_path, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    stacks = list((tmp_path / "Extract").rglob("*.mrcs"))
    assert stacks
    boxes, _ = read_mrc(stacks[0])
    assert boxes.shape[0] == N
    # each extracted box must be centered on a bright blob: xcorr vs the
    # ground-truth crop ~ 1
    for i, (cx, cy) in enumerate(truths):
        ref = mic[cy - BOX // 2 : cy + BOX // 2, cx - BOX // 2 : cx + BOX // 2]
        got = np.asarray(boxes[i], np.float32)
        a = ref - ref.mean()
        b = got - got.mean()
        cc = float(
            np.dot(a.ravel(), b.ravel())
            / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-9)
        )
        assert abs(cc) > 0.9, (i, cc)
