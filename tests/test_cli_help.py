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
    "run_maskgit_sample",
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


def test_cli_help_never_imports_jax():
    """Enforce (not just document) the convention: --help must complete on
    every CLI with jax imports BLOCKED — this is what keeps --help
    responsive when the TPU tunnel is down (jax backend init can hang
    forever there).  One subprocess covers all CLIs; the container's
    sitecustomize pre-imports jax, so the blocker first evicts it."""
    import subprocess
    import sys

    code = """
import sys
for m in [k for k in list(sys.modules) if k == "jax" or k.startswith("jax.")]:
    del sys.modules[m]

class BlockJax:
    def find_spec(self, name, path=None, target=None):
        if name == "jax" or name.startswith("jax."):
            raise ImportError(f"jax import during --help: {name}")

sys.meta_path.insert(0, BlockJax())
import importlib
failures = []
for name in %r:
    try:
        mod = importlib.import_module(f"vit_exp_tpu.cli.{name}")
        try:
            mod.main(["--help"])
        except SystemExit as e:
            if (e.code or 0) != 0:
                failures.append(f"{name}: exit {e.code}")
    except ImportError as e:
        failures.append(f"{name}: {e}")
if failures:
    print("FAILURES:", failures)
    sys.exit(1)
print("ALL_OK")
""" % (CLIS,)
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert res.returncode == 0 and "ALL_OK" in res.stdout, (
        res.stdout + res.stderr)
