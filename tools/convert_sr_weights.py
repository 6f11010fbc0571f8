"""One-shot converter: released SR frozen graph -> weights/superres.npz.

Run offline (requires tensorflow, which is only a conversion-time
dependency — the framework itself never imports TF).
"""
import os
import sys

import numpy as np
import tensorflow as tf
from tensorflow.python.platform import gfile

PB = "/root/reference/models-release/supres-40k-swir/superresolve_graph.pb"
OUT = os.path.join(os.path.dirname(__file__), "..", "weights",
                   "superres.npz")


def main():
    gd = tf.compat.v1.GraphDef()
    with gfile.FastGFile(PB, "rb") as f:
        gd.ParseFromString(f.read())
    consts = {}
    for n in gd.node:
        if n.op == "Const" and ("kernel" in n.name or "bias" in n.name):
            consts[n.name] = tf.make_ndarray(n.attr["value"].tensor)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **consts)
    print(f"wrote {len(consts)} tensors to {OUT}")


if __name__ == "__main__":
    sys.exit(main())
