"""Every CLI entry point parses --help and exits 0.

Guards the argparse surface (flag renames, shared-helper refactors like
multihost.add_cli_args) and the convention that CLIs defer heavy imports
into main() AFTER parsing — a CLI that initializes jax before argparse
would hang --help on a downed TPU tunnel.
"""

import importlib

import pytest

CLIS = [
    "convert_checkpoint",
    "export_checkpoint",
    "pack_dataset",
    "preprocess_ctrate",
    "run_ctvit_recon",
    "run_finetune",
    "run_latents",
    "run_text_classifier",
    "run_train",
    "run_zero_shot_cls",
    "run_zero_shot_seg",
    "serve",
]


@pytest.mark.parametrize("name", CLIS)
def test_cli_help_exits_zero(name, capsys):
    mod = importlib.import_module(f"vit_exp_tpu.cli.{name}")
    with pytest.raises(SystemExit) as exc:
        mod.main(["--help"])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()
