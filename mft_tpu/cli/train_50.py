"""50-shot training driver — capability parity with reference train_50.py.

The reference specializes three things (train_50.py:41-66, 153-157): the
compressed-graph GnnNet variant from gnnnet_copy (support embeddings
pair-averaged so 50-shot graphs have 5*(25+1)=130 nodes), the
``train_loop50`` query accounting (n_query = batch - 50), and a hard-coded
``save_freq=10``.  In mft_tpu the compressed head is selected automatically
whenever ``n_shot >= 50`` (GnnNetCfg.support_compress=2, methods/gnnnet.py),
so this wrapper just pins the 50-shot defaults and delegates.
"""

from __future__ import annotations

import sys

from mft_tpu.cli import train as train_cli


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not any(a.startswith("--n_shot") for a in argv):
        argv += ["--n_shot", "50"]
    if not any(a.startswith("--save_freq") for a in argv):
        argv += ["--save_freq", "10"]  # train_50.py:53,66
    train_cli.main(argv)


if __name__ == "__main__":
    main()
