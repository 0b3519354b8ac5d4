"""Smoke coverage for the measurement tools + the analysis API they use
(VERDICT r4 item 10): the tools must import cleanly (no private-symbol
imports from codec.encode) and the stable entry point must produce the
same token stream the real encoder codes."""

import importlib
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import make_test_image

TOOLS = [
    "ab_report",
    "batch_scaling",
    "bit_breakdown",
    "combo_study",
    "ctx_study",
    "epf_ab",
    "make_test_images",
    "modular_calib",
    "nnz_study",
    "rd_bound",
    "rd_point",
    "rd_position_corpus",
    "rd_position_report",
    "rd_tune",
]


@pytest.mark.parametrize("name", TOOLS)
def test_tool_imports(name):
    root = pathlib.Path(__file__).resolve().parents[1]
    if str(root) not in sys.path:
        sys.path.insert(0, str(root))
    importlib.import_module(f"tools.{name}")


def test_no_private_stage1_imports_outside_codec():
    root = pathlib.Path(__file__).resolve().parents[1]
    offenders = []
    for p in list((root / "tools").glob("*.py")) + list(
        (root / "jxl_tpu").rglob("*.py")
    ):
        for line in p.read_text().splitlines():
            if "import" in line and "_encode_stage1" in line:
                offenders.append(f"{p}: {line.strip()}")
    assert offenders == []


def test_analysis_entry_matches_encoder():
    from jxl_tpu.codec.analysis import encode_tokens_for_analysis

    rgb = make_test_image(64, 96, seed=5)
    tok, nbits, mant, params, q_sorted = encode_tokens_for_analysis(
        rgb, 1.0, height=64, width=96, effort=3
    )
    from jxl_tpu.codec.layout import token_layout

    assert tok.shape[0] == token_layout(64, 96)["n_tokens"]
    assert int(np.asarray(tok).max()) < 64
