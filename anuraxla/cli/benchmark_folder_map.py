"""``benchmark-folder-map`` — labeled-folder benchmark, MAP detector
(reference ``10b_benchmark_folder_detection_map.py``; artifacts under
outputs/detection_benchmark_map/).
"""

from anuraxla.cli.benchmark_folder import run


def main() -> None:
    # the reference MAP benchmark defaults to val_chunks (10b:300)
    run("map", "outputs/detection_benchmark_map", default_root_name="val_chunks")


if __name__ == "__main__":
    main()
