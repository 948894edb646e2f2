"""Config knob wiring (SURVEY.md §5.6). Host-side only — no kernel
compiles — so these stay in the fast tier."""

import pytest

from kzg_tpu.config import KZGConfig, configure, get_config, set_config


@pytest.fixture
def restore_config():
    old = get_config()
    yield
    set_config(old)


def test_validate_rejects_bad_values():
    with pytest.raises(ValueError):
        KZGConfig(setup_engine="gpu").validate()
    with pytest.raises(ValueError):
        KZGConfig(pairing_engine="nope").validate()
    with pytest.raises(TypeError):
        configure(not_a_field=1)


def test_setup_engine_switches_path(restore_config, monkeypatch):
    """configure(setup_engine=...) must actually steer setup()'s engine
    choice (round-2 VERDICT weak #5: the knob was dead)."""
    import importlib

    from kzg_tpu import native

    # kzg_tpu.kzg re-exports the setup() FUNCTION under the same name as
    # the module; fetch the module itself
    setup_mod = importlib.import_module("kzg_tpu.kzg.srs")

    monkeypatch.delenv("KZG_TPU_DEVICE_SETUP", raising=False)

    configure(setup_engine="device")
    assert setup_mod._host_engine_preferred() is False

    if native.available():
        configure(setup_engine="host")
        assert setup_mod._host_engine_preferred() is True
    else:
        configure(setup_engine="host")
        with pytest.raises(native.NativeError):
            setup_mod._host_engine_preferred()

    # auto on the CPU test backend prefers the native host engine when built
    configure(setup_engine="auto")
    assert setup_mod._host_engine_preferred() is native.available()

    # the env var still forces the device path at call time (back-compat)
    monkeypatch.setenv("KZG_TPU_DEVICE_SETUP", "1")
    configure(setup_engine="host")
    assert setup_mod._host_engine_preferred() is False


def test_error_enum_surface_complete():
    """All reference KZGError variants exist (lib.rs:26-36), including the
    two declared-but-never-constructed ones."""
    from kzg_tpu.kzg import (
        KZGError,
        PolynomialDegreeTooLarge,
        PointNotOnPolynomial,
        BatchedPointsNotOnPolynomial,
        NoPolynomial,
        BatchOpeningZeroRemainder,
    )

    for err in (
        PolynomialDegreeTooLarge,
        PointNotOnPolynomial,
        BatchedPointsNotOnPolynomial,
        NoPolynomial,
        BatchOpeningZeroRemainder,
    ):
        assert issubclass(err, KZGError)
