"""Import-order regression tests.

`ntt.domain` imports `kzg.errors` through the `kzg` package; an eager
`kzg/__init__` chain (setup -> coeff_form -> ntt) re-enters the
half-initialized `ntt` package when `kzg_tpu.ntt` is imported FIRST — the
circular-import failure that broke the whole package after the round-3
lazy-root-export change. Subprocesses pin each import order independently
of whatever this test session has already imported.
"""

import os
import subprocess
import sys

import pytest


def _run(code: str):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )


@pytest.mark.parametrize(
    "code",
    [
        # ntt before kzg: the order that triggered the cycle
        "import kzg_tpu.ntt; from kzg_tpu.kzg import KZGProver, KZGError",
        # kzg before ntt: the historically working order
        "from kzg_tpu.kzg import KZGProver; import kzg_tpu.ntt",
        # poly layer first (imports fields only)
        "import kzg_tpu.poly; import kzg_tpu.ntt; import kzg_tpu.kzg",
        # root lazy exports still resolve
        "import kzg_tpu; kzg_tpu.KZGError",
        # star import honors __all__ through the lazy __getattr__
        "from kzg_tpu.kzg import *; KZGVerifierEvalForm",
    ],
)
def test_import_orders(code):
    r = _run(code)
    assert r.returncode == 0, f"{code!r} failed:\n{r.stderr[-2000:]}"
