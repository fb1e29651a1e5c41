"""CLI entry points mirroring the reference script surface.

Reference script        -> anuraxla command (python -m anuraxla <name>, or
                           python -m anuraxla.cli.<module>)
00_normalize_dataset_rms   normalize
02_train_vae (TODO stub)   train-vae          (real here)
06_print_latent_coords     print-latents
07_encode_wav_to_latent    encode-wav
08_fit_radial_detector     fit-radial
08b_fit_map_detector       fit-map
09_evaluate_wav_detection  evaluate-wav
09n_..._map                evaluate-wav-map
10_benchmark_folder        benchmark-folder
10b_..._map                benchmark-folder-map
9100_spearman_rk_analysis  spearman-analysis
9105_make_config_snapshot  snapshot-from-log
9200_run_qout_grid         run-qout-grid
(extra)                    make-synth-data, bench
"""

COMMANDS = {
    "normalize": "anuraxla.cli.normalize",
    "train-vae": "anuraxla.cli.train_vae",
    "print-latents": "anuraxla.cli.print_latents",
    "encode-wav": "anuraxla.cli.encode_wav",
    "fit-radial": "anuraxla.cli.fit_radial",
    "fit-map": "anuraxla.cli.fit_map",
    "evaluate-wav": "anuraxla.cli.evaluate_wav",
    "evaluate-wav-map": "anuraxla.cli.evaluate_wav_map",
    "benchmark-folder": "anuraxla.cli.benchmark_folder",
    "benchmark-folder-map": "anuraxla.cli.benchmark_folder_map",
    "spearman-analysis": "anuraxla.cli.spearman_analysis",
    "snapshot-from-log": "anuraxla.cli.snapshot_from_log",
    "run-qout-grid": "anuraxla.cli.run_qout_grid",
    "make-synth-data": "anuraxla.cli.make_synth_data",
    "scan-soundscape": "anuraxla.cli.scan_soundscape",
    "calibrate-tau": "anuraxla.cli.calibrate_tau",
    "ingest-encoder": "anuraxla.cli.ingest_encoder",
    "ingest-decoder": "anuraxla.cli.ingest_decoder",
}

# numeric aliases matching the reference filenames
ALIASES = {
    "00": "normalize",
    "02": "train-vae",
    "06": "print-latents",
    "07": "encode-wav",
    "08": "fit-radial",
    "08b": "fit-map",
    "09": "evaluate-wav",
    "09n": "evaluate-wav-map",
    "10": "benchmark-folder",
    "10b": "benchmark-folder-map",
    "9100": "spearman-analysis",
    "9105": "snapshot-from-log",
    "9200": "run-qout-grid",
}
