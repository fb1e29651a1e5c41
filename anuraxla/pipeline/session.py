"""Load-once inference sessions: encoder + detectors.

The reference's library entry points reload the torch encoder on every call
(``09_evaluate_wav_detection.py:400`` — a cold path its own benchmark classes
had to work around, ``10:137-150``). Here the session pattern is the only
pattern: weights load once, the wav->mel->latent function jit-compiles once,
and every caller — single-file CLI, folder benchmark, calibration grid —
shares it.
"""

from __future__ import annotations

import dataclasses
import hashlib
import random as pyrandom
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anuraxla.constants import CACHE_DIR_NAME, MelConfig
from anuraxla.models.checkpoint import load_or_init_encoder
from anuraxla.ops.frontend import log_mel_batch, mel_to_encoder_input
from anuraxla.pipeline.dataset import iter_batches, scan_species_tree, subsample_paths
from anuraxla.utils.timing import stage_timer


@dataclasses.dataclass
class EncoderSession:
    """Everything needed to turn wav paths into latents, batched on device."""

    mel: MelConfig
    batch_size: int = 64
    encoder_dir: Optional[Path] = None
    project_root: Path = Path(".")
    parity: bool = True
    backend: str = "matmul"  # "matmul" | "fft" | "pallas"
    transfer_int16: bool = False  # ship PCM16 over the host->device link
    data_parallel: bool = False  # shard batches over all local devices
    quantize: bool = False  # int8 encoder contractions (models.quant)
    # encoder trunk compute dtype ("float32" | "bfloat16"); bf16 halves the
    # conv stack's HBM traffic (the encoder is bandwidth-bound on v5e —
    # measured 5.8 -> 3.5 ms/1024-batch) at ~1e-2 relative latent drift.
    # Params stay f32 and the mu/logvar heads always compute f32. Covered by
    # the latent-cache fingerprint via the arch hash (cfg.dtype).
    encoder_dtype: str = "float32"
    normalize_on_device: bool = False  # fuse RMS normalization into the mel op
    # Decode into the Pallas phase kernel's pre-padded row layout
    # (ops.pallas_frontend.phase_padded_layout): the host decoder memcpys
    # samples into a preallocated row either way, so the offset is free,
    # and the device skips its signal-sized jnp.pad (~2.2 GB HBM traffic at
    # B=1024/5s/48kHz). Trade-off: rows on the host->device link grow by
    # the pad (~23% at defaults) — a win when device-bound (PCIe-attached
    # chip, device-resident serving), a loss on a slow link; hence opt-in.
    # Latents are bitwise identical to the unpadded path (same kernel data;
    # the fused-RMS scale is computed on the sliced valid region), so the
    # cache fingerprint does NOT split. Requires parity+pallas+hop%128==0.
    pre_padded_host: bool = False
    # Broadband-noise injection for robustness evaluation (benchmark-folder
    # --add-noise-db / --snr-sweep): per-row white noise at this SNR (dB,
    # signal RMS over the valid region) is added host-side after decode,
    # then clipped to [-1, 1] like the RMS normalizer. Deterministic per
    # GLOBAL row index + noise_seed, so a file's noised latent never depends
    # on batch composition (the same reproducibility contract as the int8
    # per-row scales). None = clean. Splits the latent-cache fingerprint.
    add_noise_db: Optional[float] = None
    noise_seed: int = 0
    num_threads: int = 16
    _enc: object = None
    _params: object = None
    _fwd: object = None
    latent_dim: int = 0

    def load(self) -> "EncoderSession":
        enc, params, cfg = load_or_init_encoder(self.encoder_dir, self.project_root)
        if self.encoder_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"encoder_dtype must be float32 or bfloat16, got "
                f"{self.encoder_dtype!r}"
            )
        if self.encoder_dtype == "bfloat16":
            if self.quantize:
                raise ValueError(
                    "encoder_dtype='bfloat16' and quantize=True are mutually "
                    "exclusive (int8 serving has its own compute path)"
                )
            import dataclasses as _dc

            from anuraxla.models.vae import ConvVAEEncoder

            cfg = _dc.replace(cfg, dtype=jnp.bfloat16)
            enc = ConvVAEEncoder(cfg)  # same f32 params, bf16 trunk compute
        if tuple(cfg.input_hw) != (self.mel.target_frames, self.mel.n_mels):
            raise ValueError(
                f"encoder expects input {cfg.input_hw}, mel config produces "
                f"({self.mel.target_frames}, {self.mel.n_mels})"
            )
        self._enc, self._params = enc, params
        self._enc_cfg = cfg
        self.latent_dim = cfg.latent_dim
        self._fingerprint = None  # computed lazily (hashes the params once)
        mel_cfg, parity, backend = self.mel, self.parity, self.backend
        i16 = self.transfer_int16
        norm_dev = self.normalize_on_device

        self._layout = None  # (row_len, col_offset) pre-padded decode layout
        if self.pre_padded_host:
            from anuraxla.ops.pallas_frontend import (
                pallas_supported,
                phase_padded_layout,
            )

            if (
                not parity
                or backend != "pallas"
                or mel_cfg.hop_length % 128
                or not pallas_supported(mel_cfg, "ct")
            ):
                raise ValueError(
                    "pre_padded_host requires parity=True, backend='pallas' "
                    "and hop_length % 128 == 0 (the phase kernel's zero-copy "
                    f"layout); got parity={parity}, backend={backend!r}, "
                    f"hop={mel_cfg.hop_length}"
                )
            self._layout = phase_padded_layout(mel_cfg, mel_cfg.total_frames)
        layout = self._layout

        def to_mels(audio):
            if i16:
                audio = audio.astype(jnp.float32) / 32768.0
            if norm_dev:
                # fused RMS normalization (ops.frontend.rms_scale_batch):
                # same math as the host rms_normalize path, but the scale+clip
                # is applied inside the mel op — raw windows ship to the
                # device and the normalized signal never round-trips HBM
                from anuraxla.ops.frontend import rms_scale_batch

                if layout is not None:
                    # reduce over the sliced valid region: bitwise the same
                    # scale (and so the same latents/caches) as the
                    # unpadded path — a padded-row reduction would have a
                    # different tree (last-ulp drift)
                    _, off = layout
                    valid = jax.lax.slice_in_dim(
                        audio, off, off + mel_cfg.num_samples, axis=1
                    )
                    scale = rms_scale_batch(valid)
                else:
                    scale = rms_scale_batch(audio)
            else:
                scale = None
            return log_mel_batch(
                audio, mel_cfg, parity=parity, backend=backend,
                rms_scale=scale, pre_padded=layout is not None,
            )

        if self.quantize:
            # int8 serving: weights quantized once here; activation scales
            # dynamic per ROW (models.quant docstring) so a wav's latent —
            # and the _q8 latent cache — never depends on its batch-mates
            from anuraxla.models.quant import encoder_apply_quantized, quantize_encoder

            self._params = quantize_encoder(params, cfg)

            def compute(params, audio):
                mels = to_mels(audio)
                return encoder_apply_quantized(params, cfg, mel_to_encoder_input(mels))["mu"]

        else:

            def compute(params, audio):
                mels = to_mels(audio)
                out = enc.apply(params, mel_to_encoder_input(mels))
                return out["mu"]  # deterministic latent (reference uses z/mu)

        if self.data_parallel and len(jax.devices()) > 1:
            # batch-sharded SPMD over the 'data' axis: each chip computes its
            # shard of the batch, params replicated (anuraxla.parallel)
            from anuraxla.parallel.mesh import jit_batch_sharded, make_mesh

            mesh = make_mesh()
            nd = int(mesh.shape["data"])
            if self.batch_size % nd:
                self.batch_size = -(-self.batch_size // nd) * nd
                print(f"ℹ️ data-parallel: batch_size rounded up to "
                      f"{self.batch_size} ({nd}-way even shards)")
            self._fwd, repl, _mesh = jit_batch_sharded(
                compute, mesh=mesh, batch_size=self.batch_size
            )
            self._params = jax.device_put(self._params, repl)
            self._data_axis = int(_mesh.shape["data"])
        else:
            self._fwd = jax.jit(compute)
            self._data_axis = 1
        return self

    def reconfigure(
        self,
        *,
        duration: Optional[float] = None,
        parity: Optional[bool] = None,
        backend: Optional[str] = None,
    ) -> "EncoderSession":
        """Change frontend parameters, recompiling (and re-fingerprinting)
        only when something actually changed. The supported way to retarget a
        live session — callers must not mutate ``.mel``/``._fwd`` directly."""
        changed = False
        if duration is not None and abs(duration - self.mel.duration) > 1e-9:
            self.mel = self.mel.replace(duration=duration)
            changed = True
        if parity is not None and parity != self.parity:
            self.parity = parity
            changed = True
        if backend is not None and backend != self.backend:
            self.backend = backend
            changed = True
        if changed:
            self._fwd = None
        if self._fwd is None:
            self.load()
        return self

    def _inject_noise(self, audio: np.ndarray, start_idx: int, n_valid: int) -> np.ndarray:
        """Row-deterministic broadband noise at ``add_noise_db`` SNR. The
        noise RNG is seeded by (noise_seed, global row index) — identical
        noise for a given row position regardless of batch size — and the
        SNR references each row's own RMS over the valid (unpadded) region."""
        if self.add_noise_db is None:
            return audio
        off = 0
        if self._layout is not None and audio.shape[1] != self.mel.num_samples:
            off = self._layout[1]
        L = self.mel.num_samples
        audio = np.array(audio, np.float32, copy=True)
        factor = 10.0 ** (-float(self.add_noise_db) / 20.0)
        for i in range(int(n_valid)):
            seg = audio[i, off : off + L]
            rms = float(np.sqrt(np.mean(seg * seg)))
            if rms <= 0.0:
                continue
            g = np.random.default_rng((int(self.noise_seed), start_idx + i))
            seg += (rms * factor) * g.standard_normal(L).astype(np.float32)
            np.clip(seg, -1.0, 1.0, out=seg)
        return audio

    def encode_array(self, audio: np.ndarray) -> np.ndarray:
        """[B, num_samples] waveforms -> [B, D] latents (device roundtrip).

        With ``transfer_int16`` the batch crosses the host->device link as
        PCM16 (half the bytes — exactly lossless when the source files are
        16-bit PCM, which the reference's normalized datasets are; for float
        sources it adds one PCM16 quantization)."""
        audio = self._inject_noise(np.asarray(audio, np.float32), 0, audio.shape[0])
        return np.asarray(self._dispatch(audio))[: audio.shape[0]]

    def _dispatch(self, audio: np.ndarray):
        """Start the device computation without fetching (async dispatch).
        Under data-parallel serving, ragged batches (e.g. a single wav) are
        padded to a data-axis multiple — SPMD needs even shards; callers
        already slice results to their own row count."""
        if self._layout is not None and audio.shape[1] == self.mel.num_samples:
            # raw [B, num_samples] rows from encode_array callers: stage
            # into the pre-padded layout host-side (encode_paths batches
            # already arrive in it from the decoder)
            row_len, off = self._layout
            staged = np.zeros((audio.shape[0], row_len), np.float32)
            staged[:, off : off + self.mel.num_samples] = audio
            audio = staged
        if self.transfer_int16 and audio.dtype != np.int16:
            audio = np.clip(np.round(audio * 32768.0), -32768, 32767).astype(np.int16)
        if getattr(self, "_data_axis", 1) > 1 and audio.shape[0] % self._data_axis:
            from anuraxla.parallel.mesh import pad_to_multiple

            audio, _ = pad_to_multiple(np.asarray(audio), self._data_axis)
        return self._fwd(self._params, jnp.asarray(audio))

    def encode_paths(self, paths: Sequence[Path]) -> Tuple[np.ndarray, np.ndarray, List[Optional[str]]]:
        """Decode+encode a path list. Returns (Z [N, D], ok [N], errors [N]).

        Three-way overlap: host decode of batch i+1 (prefetch thread), device
        compute of batch i (async dispatch), host fetch of batch i-1 (2-deep
        pipelining — the device->host fetch otherwise serializes every step).
        """
        N = len(paths)
        Z = np.zeros((N, self.latent_dim), np.float32)
        ok = np.zeros(N, bool)
        errors: List[Optional[str]] = [None] * N
        pos = 0
        pending = None  # (device_result, start, n_valid)
        for batch, n_valid in iter_batches(
            paths,
            sr=self.mel.sr,
            num_samples=self.mel.num_samples,
            batch_size=self.batch_size,
            num_threads=self.num_threads,
            layout=self._layout,
            # injection runs on the prefetch thread (overlapped with device
            # compute), not here between dispatches
            transform=self._inject_noise if self.add_noise_db is not None else None,
        ):
            ok[pos : pos + n_valid] = batch.ok[:n_valid]
            errors[pos : pos + n_valid] = batch.errors[:n_valid]
            cur = (self._dispatch(batch.audio), pos, n_valid)
            if pending is not None:
                z, p0, nv = pending
                Z[p0 : p0 + nv] = np.asarray(z)[:nv]
            pending = cur
            pos += n_valid
        if pending is not None:
            z, p0, nv = pending
            Z[p0 : p0 + nv] = np.asarray(z)[:nv]
        return Z, ok, errors


def cache_path_for(
    cache_dir: Path, chunks_dir: Path, species: str, tag: str = ""
) -> Path:
    """``cache_npz/Z_<rootname>_<species><tag>.npz`` (``08:467``). Our
    archives add a mel-parameter fingerprint to detect the stale-cache hazard
    the reference's key ignores (SURVEY.md 'quirks'). ``tag`` gives variant
    encodes (e.g. noise-augmented fit legs) their own file so they don't
    thrash the clean archive."""
    return Path(cache_dir) / f"Z_{Path(chunks_dir).name}_{species}{tag}.npz"


def mel_fingerprint(mel: MelConfig) -> str:
    return (
        f"sr{mel.sr}_d{mel.duration}_m{mel.n_mels}_f{mel.fmin}-{mel.fmax}"
        f"_h{mel.hop_length}_n{mel.n_fft}_t{mel.target_frames}"
    )


def session_fingerprint(session: EncoderSession) -> str:
    """Cache key covering everything that changes latents: mel parameters,
    frontend mode (parity/backend), the encoder WEIGHTS (hash of the
    serialized params — a retrained encoder must invalidate caches even when
    its path and the mel config are unchanged), AND the encoder architecture
    knobs (conv_padding/gn_eps/activation/groups change latents with
    byte-identical params — e.g. the same torch .pt ingested via the twin
    path vs hydra_ingest)."""
    if getattr(session, "_fingerprint", None):
        return session._fingerprint
    import dataclasses
    import hashlib
    import json

    from flax import serialization

    digest = hashlib.blake2b(
        serialization.to_bytes(session._params), digest_size=10
    ).hexdigest()
    cfg = getattr(session, "_enc_cfg", None)
    arch = ""
    if cfg is not None:
        d = dataclasses.asdict(cfg)
        d["dtype"] = str(jnp.dtype(d.get("dtype", jnp.float32)).name)  # bf16 compute changes latents
        d = {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}
        arch = "_a" + hashlib.blake2b(
            json.dumps(d, sort_keys=True).encode(), digest_size=6
        ).hexdigest()
    # the EFFECTIVE backend, post-fallback (ops.frontend.resolved_backend):
    # 'pallas' on a CPU-only host runs matmul math (~3e-7 rel different
    # from the kernel), so keying the cache by the requested name would
    # mix two numerically different frontends across hosts
    from anuraxla.ops.frontend import resolved_backend

    eff_backend = resolved_backend(session.mel, session.backend)
    fp = (
        f"{mel_fingerprint(session.mel)}_p{int(session.parity)}"
        f"_{eff_backend}_e{digest}{arch}"
        + ("_q8" if getattr(session, "quantize", False) else "")
        # int16 link transfer quantizes float/resampled/mixdown sources — it
        # changes latents, so it must split the cache key
        + ("_i16" if getattr(session, "transfer_int16", False) else "")
        # device-fused RMS normalization: compute() normalizes raw input
        # itself, so the same file yields different latents than a session
        # that expects pre-normalized chunks — the key must split
        + ("_ndev" if getattr(session, "normalize_on_device", False) else "")
        # robustness-eval noise injection changes latents deterministically
        # per (seed, row) — a noised run must never poison clean caches
        + (
            f"_nz{session.add_noise_db:g}s{session.noise_seed}"
            if getattr(session, "add_noise_db", None) is not None
            else ""
        )
    )
    session._fingerprint = fp
    return fp


def encode_species_tree(
    session: EncoderSession,
    chunks_dir: Path,
    species: Sequence[str],
    *,
    cache: bool = False,
    cache_dir: Optional[Path] = None,
    max_per_class: int = 0,
    seed: int = 123,
    cache_tag: str = "",
    log=print,
) -> Tuple[Dict[str, np.ndarray], Dict[str, int], Dict[str, int]]:
    """Per-species encode with optional .npz cache and subsampling — the
    batched replacement for the reference's hot loop (``08:461-521``).

    Returns (Z_by_species, failed_counts, used_counts). Species with no wavs
    or no successful encodes are omitted (reference skip semantics).
    """
    tree = scan_species_tree(chunks_dir, species)
    rng = pyrandom.Random(seed)  # seeded once; draws consume sequential state
    if cache:
        cache_dir = Path(cache_dir) if cache_dir else Path(CACHE_DIR_NAME)
        cache_dir.mkdir(parents=True, exist_ok=True)

    Z_by: Dict[str, np.ndarray] = {}
    failed: Dict[str, int] = {}
    used: Dict[str, int] = {}
    fp = session_fingerprint(session)
    root_key = str(Path(chunks_dir).resolve())
    # seed only matters when subsampling actually draws
    sub_key = f"{max_per_class}:{seed}" if max_per_class else "all"

    for sp in species:
        wavs = tree.get(sp, [])
        # the folder's file LIST is identity too: noised latents
        # (add_noise_db) are seeded by each file's row position, so adding/
        # removing/renaming one wav changes every later file's noise — and
        # even clean archives hold latents for exactly these files
        files_key = hashlib.sha1(
            "\n".join(p.name for p in wavs).encode()
        ).hexdigest()[:16]
        cpath = cache_path_for(cache_dir, chunks_dir, sp, cache_tag) if cache else None
        if cpath is not None and cpath.exists():
            data = np.load(cpath, allow_pickle=False)
            # stale when ANY of the identity fields is missing or differs:
            # the session fingerprint (mel/frontend/encoder), the RESOLVED
            # source root (same-named trees from different datasets share a
            # file name), the subsampling request (the archive stores the
            # post-subsample latents, so max_per_class/seed are identity
            # too), and the folder's file list
            stale = (
                "mel_fp" not in data or str(data["mel_fp"]) != fp
                or "root" not in data or str(data["root"]) != root_key
                or "sub" not in data or str(data["sub"]) != sub_key
                or "files" not in data or str(data["files"]) != files_key
            )
            if not stale:
                Zm = data["Z"].astype(np.float32)
                Z_by[sp] = Zm
                failed[sp] = int(data["failed"]) if "failed" in data else 0
                used[sp] = int(Zm.shape[0])
                log(f"🧊 {sp}: cache {cpath.name} -> N={Zm.shape[0]}")
                continue
            log(f"♻️ {sp}: cache stale (mel/frontend/encoder/root/subsample/file-list changed), re-encoding")

        if not wavs:
            log(f"⚠️ {sp}: no wavs under {Path(chunks_dir) / sp} (skipped)")
            continue
        wavs = subsample_paths(wavs, max_per_class, rng)

        with stage_timer(f"encode[{sp}]", n_items=len(wavs), log=None) as t:
            Z, ok, _errors = session.encode_paths(wavs)
        n_fail = int((~ok).sum())
        if ok.sum() == 0:
            log(f"❌ {sp}: nothing could be encoded (skipped)")
            continue
        Zm = Z[ok]
        Z_by[sp] = Zm
        failed[sp] = n_fail
        used[sp] = int(Zm.shape[0])
        log(f"🧪 {sp}: encoded N={Zm.shape[0]} (failed={n_fail}) [{t.rate:.1f} chunks/s]")

        if cpath is not None:
            np.savez_compressed(
                cpath, Z=Zm, failed=n_fail, root=root_key, mel_fp=fp,
                sub=sub_key, files=files_key,
            )
            log(f"   ↳ cached: {cpath.name}")

    return Z_by, failed, used


def concat_species_latents(
    Z_by: Dict[str, np.ndarray], species: Sequence[str]
) -> Tuple[np.ndarray, np.ndarray]:
    """{sp: [N, D]} -> (Z [N_total, D], true_idx [N_total]) with labels
    indexed by position in ``species``; species absent from Z_by are skipped.
    The one evaluation-set flattening used by the calibration sweeps."""
    present = [(i, sp) for i, sp in enumerate(species) if sp in Z_by]
    if not present:
        raise SystemExit(
            "❌ no evaluation latents: none of the species "
            f"{list(species)} had encodable wavs (wrong --val-root?)"
        )
    Z = np.concatenate([Z_by[sp] for _, sp in present])
    true_idx = np.concatenate(
        [np.full(len(Z_by[sp]), i, np.int32) for i, sp in present]
    )
    return Z, true_idx


def pad_species_latents(
    Z_by: Dict[str, np.ndarray]
) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """Ragged {sp: [N_sp, D]} -> (species order, Z [K, Nmax, D], mask [K, Nmax])
    — the fixed-shape layout detect.fit_* expect."""
    species = list(Z_by.keys())
    if not species:
        raise ValueError("no encoded species")
    Nmax = max(z.shape[0] for z in Z_by.values())
    D = next(iter(Z_by.values())).shape[1]
    K = len(species)
    Z = np.zeros((K, Nmax, D), np.float32)
    mask = np.zeros((K, Nmax), bool)
    for i, sp in enumerate(species):
        n = Z_by[sp].shape[0]
        Z[i, :n] = Z_by[sp]
        mask[i, :n] = True
    return species, Z, mask
