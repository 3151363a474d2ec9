"""``python -m notorch_tpu`` -> the training CLI."""

from notorch_tpu.cli.train import main

if __name__ == "__main__":
    main()
