"""Service launcher, path-parity with the reference's repo-root webapp.py.

    BASE_CONFIG=... CKPT_PATH=... INDEX_DIR=... python webapp.py --port 8000
"""
from sic_tpu.service.app import main

if __name__ == "__main__":
    main()
