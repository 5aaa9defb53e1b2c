"""Byte-level console-format harness for the training log.

The reference's training console output (reference train.py:516-788 —
banner, per-epoch loss summary, adaptive-weight block, validation report,
best-model line, final summary) is a de-facto contract users grep and
parse. fit() mirrors that format (fit.py; commit 130eb0c); this test pins
it byte-for-byte after masking the volatile tokens (numbers, timestamped
paths), so a formatting regression diffs loudly against the committed
golden transcript (tests/golden/console_format.txt).

Regenerate the golden after an INTENTIONAL format change:
    FMC_UPDATE_GOLDEN=1 python -m pytest tests/test_console_format.py
"""

import contextlib
import copy
import io
import os
import re

import pytest

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.data.synthetic import generate_synthetic_dataset
from fmc_uia_tpu.fit import fit
from tests.helpers import TINY_CONFIG

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "console_format.txt")

pytestmark = pytest.mark.slow  # full fit() run: compile-heavy on CPU


def normalize(text: str) -> str:
    """Mask volatile tokens, keep every structural byte.

    * floats -> F, standalone integers -> N (epoch counters like
      "Epoch [1/2]" keep their meaning as N/N)
    * filesystem paths -> P
    * runs of spaces -> one space (pandas to_string pads columns to the
      width of the masked values)
    * NaN stays literal (it is format, not value: which metric columns a
      task fills is part of the report contract)
    """
    text = re.sub(r"/(?:[\w.\-]+/)+[\w.\-]+", "P", text)
    text = re.sub(r"\d+\.\d+(e[+-]?\d+)?", "F", text)
    text = re.sub(r"\b\d+\b", "N", text)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r" +$", "", text, flags=re.M)
    return text


def test_console_format_matches_golden(tmp_path):
    root = tmp_path / "data"
    generate_synthetic_dataset(str(root), samples_per_task=8, seed=0)

    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["data"]["root_path"] = str(root)
    cfg_dict["data"]["batch_size"] = 4
    cfg_dict["data"]["image_size"] = 64
    cfg_dict["training"]["num_epochs"] = 2
    cfg_dict["training"]["steps_per_epoch"] = 4
    cfg_dict["training"]["print_freq"] = 2
    cfg_dict["experiment"]["output_dir"] = str(tmp_path / "out")
    cfg = Config(config_dict=cfg_dict)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fit(config=cfg)
    got = normalize(buf.getvalue())

    if os.environ.get("FMC_UPDATE_GOLDEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        with open(GOLDEN, "w") as f:
            f.write(got)
        pytest.skip("golden updated")

    assert os.path.exists(GOLDEN), (
        "golden transcript missing — run with FMC_UPDATE_GOLDEN=1")
    with open(GOLDEN) as f:
        want = f.read()
    assert got == want, (
        "console format drifted from the golden transcript; if the change "
        "is intentional regenerate with FMC_UPDATE_GOLDEN=1\n"
        + "\n".join(_first_diff(got, want)))


def _first_diff(got: str, want: str):
    g, w = got.splitlines(), want.splitlines()
    for i, (a, b) in enumerate(zip(g, w)):
        if a != b:
            return [f"first differing line {i + 1}:",
                    f"  got:  {a!r}", f"  want: {b!r}"]
    return [f"line-count difference: got {len(g)} vs want {len(w)}"]
