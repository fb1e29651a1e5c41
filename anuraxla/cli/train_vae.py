"""``train-vae`` — train the conv VAE on a chunk tree and export the encoder
artifact. The reference's ``scripts/02_train_vae.sh`` is an empty TODO stub;
this makes the step real: wav tree -> log-mel batches -> beta-VAE training
(data-parallel over all local devices) -> encoder artifact usable by every
downstream fit/evaluate command.
"""

from __future__ import annotations

import argparse
import itertools
from pathlib import Path

import numpy as np

from anuraxla.cli.common import (
    add_batch_args,
    add_device_arg,
    add_mel_args,
    apply_device,
    mel_from_args,
    project_root_here,
    resolve_tier_knobs,
)
from anuraxla.constants import DEFAULT_ENCODER_DIR
from anuraxla.models.checkpoint import save_encoder, save_train_state
from anuraxla.models.train import TrainConfig
from anuraxla.models.vae import VAEConfig, encoder_params_from_vae
from anuraxla.ops.frontend import log_mel_batch, mel_to_encoder_input
from anuraxla.pipeline.dataset import iter_batches, scan_species_tree
from anuraxla.utils.timing import stage_timer


def mel_batch_stream(
    root: Path,
    mel,
    batch_size: int,
    io_threads: int,
    epochs: int,
    *,
    parity: bool = True,
    backend: str = "matmul",
):
    """Endless [B, T, M, 1] mel batches from a chunk tree (all species mixed,
    reshuffled each epoch). ``parity``/``backend`` select the same frontend
    variants the serving CLIs expose — train on the features you will serve."""
    import random

    tree = scan_species_tree(root)
    paths = [p for wavs in tree.values() for p in wavs]
    if not paths:
        raise SystemExit(f"❌ no wavs under {root}")
    rng = random.Random(0)
    for _epoch in range(epochs) if epochs > 0 else itertools.count():
        rng.shuffle(paths)
        for batch, n_valid in iter_batches(
            paths, sr=mel.sr, num_samples=mel.num_samples,
            batch_size=batch_size, num_threads=io_threads,
        ):
            audio = batch.audio
            if not batch.ok.all():
                # don't train on zeroed failed-decode rows: replace them with
                # copies of good rows so the batch shape stays fixed
                good = np.flatnonzero(batch.ok)
                if good.size == 0:
                    continue
                bad = np.flatnonzero(~batch.ok)
                audio = audio.copy()
                audio[bad] = audio[good[bad % good.size]]
            mels = np.asarray(log_mel_batch(audio, mel, parity=parity, backend=backend))
            yield np.asarray(mel_to_encoder_input(mels))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, type=str, help="training chunk tree (per-species subdirs)")
    p.add_argument("--out", type=str, default=None, help="encoder artifact output dir")
    p.add_argument("--ckpt-dir", type=str, default=None, help="orbax train-state checkpoints")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --ckpt-dir")
    p.add_argument("--save-decoder", action="store_true",
                   help="also export the full VAE (encoder+decoder) artifact")
    p.add_argument("--init-from", type=str, default=None,
                   help="warm-start the encoder from an encoder artifact dir "
                   "(e.g. the output of ingest-encoder on reference weights); "
                   "the artifact's architecture overrides --latent-dim and "
                   "must match the mel frame geometry")
    p.add_argument("--init-from-decoder", type=str, default=None,
                   help="warm-start the decoder from a decoder artifact dir "
                   "(ingest-decoder output); trains the ingested decoder "
                   "STRUCTURE, so its out_hw must equal the encoder input")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--epochs", type=int, default=0, help="0 = loop until --steps")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--beta", type=float, default=0.25)
    p.add_argument("--kl-warmup", type=int, default=500,
                   help="linear KL ramp 0->beta over this many steps after the "
                   "delay (0 = off)")
    p.add_argument("--kl-delay", type=int, default=200,
                   help="HARD beta=0 for this many steps first. The delay (not "
                   "just the ramp) is what protects latent geometry: AdamW's "
                   "normalized updates let any consistent KL gradient collapse "
                   "mu before recon learns (measured: see models.train.TrainConfig)")
    p.add_argument("--latent-dim", type=int, default=128)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute dtype")
    # --data-parallel comes from add_batch_args (shared with the encode CLIs)
    p.add_argument("--seed", type=int, default=0)
    add_device_arg(p)
    add_mel_args(p)
    add_batch_args(p)
    args = p.parse_args()
    apply_device(args.device)

    import jax
    import jax.numpy as jnp

    project_root = project_root_here()
    mel = mel_from_args(args, duration=5.0)
    decoder_spec = None
    init_params = None
    if args.init_from:
        import dataclasses

        from anuraxla.models.checkpoint import load_encoder

        _, enc_params, vcfg = load_encoder(args.init_from)
        if vcfg.input_hw != (mel.target_frames, mel.n_mels):
            raise SystemExit(
                f"❌ --init-from encoder consumes {vcfg.input_hw}, the mel "
                f"config produces ({mel.target_frames}, {mel.n_mels}) — "
                "adjust --duration/--hop-length/--n-mels to the artifact"
            )
        vcfg = dataclasses.replace(
            vcfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
        )
        if args.latent_dim != vcfg.latent_dim:
            print(f"ℹ️ --init-from overrides latent_dim: {vcfg.latent_dim}")
        dec_params = None
        if args.init_from_decoder:
            from anuraxla.models.checkpoint import load_decoder

            _, dparams, decoder_spec = load_decoder(args.init_from_decoder)
            dec_params = dparams["params"]
        from anuraxla.models.vae import init_vae

        _, template = init_vae(vcfg, seed=args.seed, decoder_spec=decoder_spec)
        init_params = {"params": {
            "encoder": enc_params["params"],
            "decoder": dec_params if dec_params is not None
            else template["params"]["decoder"],
        }}
        print(f"▶ warm start: encoder from {args.init_from}"
              + (f", decoder from {args.init_from_decoder}"
                 if args.init_from_decoder else ", decoder random-init"))
    elif args.init_from_decoder:
        raise SystemExit("❌ --init-from-decoder requires --init-from (the "
                         "decoder spec must pair with the encoder config)")
    else:
        vcfg = VAEConfig(
            latent_dim=args.latent_dim,
            input_hw=(mel.target_frames, mel.n_mels),
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        )
    tc = TrainConfig(
        learning_rate=args.lr, beta=args.beta, total_steps=args.steps,
        kl_warmup_steps=args.kl_warmup, kl_delay_steps=args.kl_delay,
        batch_size=args.batch_size, seed=args.seed,
    )

    if args.transfer_int16 or args.quantize_serving:
        print("ℹ️ --transfer-int16/--quantize-serving are serving-path flags; "
              "training ignores them")
    # --serving-tier picks the frontend knobs here too: "train on the
    # features you will serve" (the tier's encoder_dtype is a serving knob —
    # training precision stays --bf16)
    knobs = resolve_tier_knobs(args)
    backend = knobs["frontend_backend"]
    if backend in ("matmul", "matmul-bf16") and jax.default_backend() == "cpu":
        # the dense-DFT matmul exists for the MXU; on CPU it is ~300 GFLOP
        # per batch (minutes/step). The fft backend is the librosa-exact
        # oracle — same math, ~1000x cheaper on host. (pallas* resolves its
        # own CPU fallback inside ops.frontend.)
        backend = "fft"
        print("ℹ️ CPU training: using the fft mel backend (matmul is MXU-only fast)")
    stream = mel_batch_stream(
        Path(args.root), mel, args.batch_size, args.io_threads, args.epochs,
        parity=not knobs["fast_frontend"], backend=backend,
    )

    initial_state = None
    if args.resume:
        if not args.ckpt_dir:
            raise SystemExit("❌ --resume requires --ckpt-dir")
        from anuraxla.models.checkpoint import restore_train_state
        from anuraxla.models.train import create_train_state

        _, template = create_train_state(vcfg, tc, decoder_spec=decoder_spec)
        initial_state = restore_train_state(args.ckpt_dir, template)
        print(f"▶ resumed from step {int(initial_state.step)} in {args.ckpt_dir}")

    with stage_timer("train", n_items=args.steps * args.batch_size) as t:
        if args.data_parallel and len(jax.devices()) > 1:
            from anuraxla.parallel.train_sharded import train_loop_sharded

            if initial_state is not None:
                raise SystemExit("❌ --resume with --data-parallel is not supported yet")
            if init_params is not None:
                raise SystemExit("❌ --init-from with --data-parallel is not supported yet")
            vae, state, metrics = train_loop_sharded(vcfg, tc, stream, num_steps=args.steps)
        else:
            from anuraxla.models.train import train_loop

            vae, state, metrics = train_loop(
                vcfg, tc, stream, num_steps=args.steps,
                initial_state=initial_state,
                decoder_spec=decoder_spec, init_params=init_params,
            )
    print(f"🏁 {args.steps} steps in {t.seconds:.1f}s ({t.rate:.1f} examples/s); final {metrics}")

    out = Path(args.out) if args.out else (project_root / DEFAULT_ENCODER_DIR)
    save_encoder(out, vcfg, encoder_params_from_vae(state.params))
    print(f"💾 encoder artifact: {out}")
    if args.save_decoder:
        if decoder_spec is not None:
            # an ingested decoder structure does not fit the native ConvVAE
            # template — save it as a standalone decoder artifact instead
            from anuraxla.models.checkpoint import save_decoder

            vdir = Path(str(out) + "_decoder")
            save_decoder(vdir, decoder_spec,
                         {"params": state.params["params"]["decoder"]})
            print(f"💾 decoder artifact (ingested structure): {vdir}")
        else:
            from anuraxla.models.checkpoint import save_vae

            vdir = Path(str(out) + "_full")
            save_vae(vdir, vcfg, state.params)
            print(f"💾 full VAE (encoder+decoder) artifact: {vdir}")
    if args.ckpt_dir:
        save_train_state(args.ckpt_dir, state)
        print(f"💾 train state: {args.ckpt_dir}")


if __name__ == "__main__":
    main()
