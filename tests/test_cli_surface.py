"""Every CLI command must import and expose a parsable argparse surface, and
the dispatcher must resolve names and numeric aliases."""

import importlib
import sys

import pytest

from anuraxla.cli import ALIASES, COMMANDS


@pytest.mark.parametrize("name,module", sorted(COMMANDS.items()))
def test_command_help(name, module, monkeypatch, capsys):
    mod = importlib.import_module(module)
    assert hasattr(mod, "main"), module
    monkeypatch.setattr(sys, "argv", ["prog", "--help"])
    with pytest.raises(SystemExit) as e:
        mod.main()
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "usage" in out.lower()


def test_aliases_resolve():
    for alias, target in ALIASES.items():
        assert target in COMMANDS, (alias, target)


def test_reference_flag_names_present():
    """The reference's flag vocabulary must parse (migration contract)."""
    checks = {
        "anuraxla.cli.fit_radial": ["--root", "x", "--q-in", "0.9", "--q-out", "0.1",
                                    "--max-per-class", "5", "--seed", "1", "--cache",
                                    "--sr", "48000", "--n-mels", "64", "--target-frames",
                                    "192", "--fmin", "150", "--fmax", "15000",
                                    "--hop-length", "384", "--n-fft", "2048",
                                    "--device", "cpu", "--config", "c.json"],
        "anuraxla.cli.fit_map": ["--root", "x", "--cov-type", "qda", "--cov-structure",
                                 "diag", "--priors", "uniform", "--eps", "1e-5",
                                 "--shrink", "0.2", "--set-tau-q", "0.01"],
        "anuraxla.cli.evaluate_wav": ["--wav", "f.wav"],
        "anuraxla.cli.encode_wav": ["--wav", "f.wav", "--duration", "3.0",
                                    "--auto-frames", "--jsonl", "--precision", "4"],
        "anuraxla.cli.benchmark_folder": ["--root", "r"],
        "anuraxla.cli.snapshot_from_log": ["--log", "l", "--q-in", "0.9",
                                           "--q-out", "0.1", "--out", "o.json"],
        "anuraxla.cli.print_latents": ["--n", "3", "--all", "--jsonl", "--show-cols",
                                       "--max-width", "100"],
        "anuraxla.cli.normalize": ["--base-dir", "d", "--sr", "48000"],
    }
    for module, argv in checks.items():
        mod = importlib.import_module(module)
        parser = getattr(mod, "build_parser", None)
        if parser is None:
            continue  # commands without a build_parser are covered by --help
        args = parser().parse_args(argv)
        assert args is not None, module


def test_fit_map_small_n_preset_resolution():
    """--preset small-n fills diag+shrink 0.1; explicit flags win; no preset
    keeps the reference defaults (full, 0.0)."""
    from anuraxla.cli.fit_map import build_parser, resolve_preset

    cov, shr, notes = resolve_preset(build_parser().parse_args(
        ["--root", "x", "--preset", "small-n"]))
    assert (cov, shr) == ("diag", 0.1)
    assert any("tau" in n for n in notes)  # tau guidance printed

    cov, shr, _ = resolve_preset(build_parser().parse_args(
        ["--root", "x", "--preset", "small-n", "--cov-structure", "full",
         "--shrink", "0.3", "--set-tau-q", "0.01"]))
    assert (cov, shr) == ("full", 0.3)

    cov, shr, notes = resolve_preset(build_parser().parse_args(["--root", "x"]))
    assert (cov, shr, notes) == ("full", 0.0, [])


def test_subprocess_compat_forwards_all_result_changing_flags():
    """--subprocess-compat must forward every results-changing option that
    add_batch_args/add_mel_args expose — pinned here because the forwarding
    list silently drifted from the flag surface once (review r2 finding)."""
    from anuraxla.cli.run_qout_grid import build_parser, subprocess_shared_args

    args = build_parser().parse_args([
        "--fast-frontend", "--frontend-backend", "pallas-bf16",
        "--transfer-int16", "--quantize-serving", "--data-parallel",
        "--encoder", "enc_dir", "--batch-size", "128",
    ])
    shared = subprocess_shared_args(args, "cfg.json")
    for flag in ("--fast-frontend", "--transfer-int16", "--quantize-serving",
                 "--data-parallel", "--frontend-backend", "--encoder-dtype",
                 "--encoder", "--sr", "--n-mels", "--target-frames", "--fmin",
                 "--fmax", "--hop-length", "--n-fft", "--batch-size",
                 "--io-threads"):
        assert flag in shared, flag
    assert shared[shared.index("--frontend-backend") + 1] == "pallas-bf16"
    # tier knobs forward RESOLVED: a tier spelled as --serving-tier reaches
    # the child as the explicit per-flag values too (review r5 finding: the
    # forwarding used to omit --encoder-dtype entirely)
    args_tier = build_parser().parse_args(["--serving-tier", "fast"])
    shared_tier = subprocess_shared_args(args_tier, "cfg.json")
    assert shared_tier[shared_tier.index("--encoder-dtype") + 1] == "bfloat16"
    assert shared_tier[shared_tier.index("--frontend-backend") + 1] == "pallas-bf16"
    assert "--fast-frontend" in shared_tier
    # and the boolean flags are NOT forwarded when off
    args_off = build_parser().parse_args([])
    shared_off = subprocess_shared_args(args_off, "cfg.json")
    for flag in ("--fast-frontend", "--transfer-int16", "--quantize-serving",
                 "--data-parallel"):
        assert flag not in shared_off, flag


def test_serving_tier_resolution():
    """--serving-tier bundles (VERDICT r4 item 3): each named tier maps to
    the documented knob set; explicit flags override the tier; 'custom'
    leaves individual flags untouched."""
    import argparse

    from anuraxla.cli.common import add_batch_args, resolve_tier_knobs, session_kwargs

    def parse(argv):
        p = argparse.ArgumentParser()
        add_batch_args(p)
        return p.parse_args(argv)

    # the three named tiers == the three bench.py legs
    k = resolve_tier_knobs(parse(["--serving-tier", "parity"]))
    assert k == {"fast_frontend": False, "frontend_backend": "pallas",
                 "encoder_dtype": "float32"}
    k = resolve_tier_knobs(parse(["--serving-tier", "balanced"]))
    assert k == {"fast_frontend": False, "frontend_backend": "pallas",
                 "encoder_dtype": "bfloat16"}
    k = resolve_tier_knobs(parse(["--serving-tier", "fast"]))
    assert k == {"fast_frontend": True, "frontend_backend": "pallas-bf16",
                 "encoder_dtype": "bfloat16"}

    # custom (default): flags pass through unchanged
    k = resolve_tier_knobs(parse([]))
    assert k == {"fast_frontend": False, "frontend_backend": "matmul",
                 "encoder_dtype": "float32"}

    # explicit flag beats the tier
    k = resolve_tier_knobs(parse(["--serving-tier", "fast",
                                  "--frontend-backend", "pallas"]))
    assert k["frontend_backend"] == "pallas" and k["fast_frontend"] is True

    # ... even when the explicit value EQUALS the built-in default (review
    # r5 finding: the old default-comparison heuristic silently replaced
    # `--serving-tier fast --encoder-dtype float32` with the tier's bf16)
    k = resolve_tier_knobs(parse(["--serving-tier", "fast",
                                  "--encoder-dtype", "float32"]))
    assert k["encoder_dtype"] == "float32"
    assert k["fast_frontend"] is True and k["frontend_backend"] == "pallas-bf16"
    k = resolve_tier_knobs(parse(["--serving-tier", "fast",
                                  "--frontend-backend", "matmul"]))
    assert k["frontend_backend"] == "matmul"

    # session_kwargs consumes the resolved knobs
    sk = session_kwargs(parse(["--serving-tier", "fast"]))
    assert sk["parity"] is False and sk["backend"] == "pallas-bf16"
    assert sk["encoder_dtype"] == "bfloat16"
    sk = session_kwargs(parse(["--serving-tier", "balanced"]))
    assert sk["parity"] is True and sk["backend"] == "pallas"

    # and run-qout-grid forwards the tier to subprocess-compat children
    from anuraxla.cli.run_qout_grid import build_parser, subprocess_shared_args

    args = build_parser().parse_args(["--serving-tier", "fast"])
    shared = subprocess_shared_args(args, "cfg.json")
    assert shared[shared.index("--serving-tier") + 1] == "fast"


def test_compile_cache_opt_out_values(monkeypatch):
    """ANURAXLA_COMPILE_CACHE=0 must DISABLE the cache (review r5 finding:
    02_train_vae.sh defaults the var to 1 with ${:-1}, so a user opt-out
    arrives as the truthy string "0")."""
    import jax

    import anuraxla

    before = jax.config.jax_compilation_cache_dir
    for off in ("0", "false", "OFF", "no", ""):
        monkeypatch.setenv("ANURAXLA_COMPILE_CACHE", off)
        monkeypatch.setattr(jax.config, "update",
                            lambda *a, **k: pytest.fail(f"cache enabled for {off!r}"))
        anuraxla._enable_compilation_cache()
    assert jax.config.jax_compilation_cache_dir == before
