"""50-shot cross-domain evaluation — capability parity with reference
finetune_50.py.

The reference differs from finetune.py only in importing the compressed
GnnNet from gnnnet_copy (finetune_50.py:20: 130-node pair-averaged graphs)
and in precomputing DampNet source prototypes over miniImageNet before eval
(finetune_50.py:591-622 — in mft_tpu the prototypes persist inside the
DampNet checkpoint's state, and the shared eval driver sweeps the source
dataset at eval time whenever a checkpoint predates the prototype-refresh
epoch).  The compressed head is selected automatically at ``n_shot >= 50``,
so this wrapper pins the default shot count and delegates.
"""

from __future__ import annotations

import sys

from mft_tpu.cli import finetune as finetune_cli


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not any(a.startswith("--n_shot") for a in argv):
        argv += ["--n_shot", "50"]
    return finetune_cli.main(argv)


if __name__ == "__main__":
    main()
