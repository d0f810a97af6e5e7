"""FlexDiffuse TPU web UI entry point (reference ui.py)."""
from flexdiffuse_tpu.interface.app import main

if __name__ == '__main__':
    main()
