"""`python -m spectrogram_cube_clustering_tpu.cli <init.ini>` == run-dc."""

from spectrogram_cube_clustering_tpu.cli.run_dc import main

if __name__ == "__main__":
    main()
