"""``python -m flexdiffuse_tpu`` launches the web UI (reference __main__.py)."""
from flexdiffuse_tpu.interface.app import main

main()
