"""Blind-evaluation driver: the reference's SortContext + CLI.

Rebuild of /root/reference/src/sort.h:15-103 and main.cpp:9-44 —
the FHERMA-competition-style harness: deserialize the crypto context,
public key, eval-mult key, rotation keys, and input ciphertext from
files, run a sort WITHOUT the secret key, serialize the output.

    python -m sorting_fhe_tpu --cc cc.json --key_pub key_pub.npz \
        --key_mult key_mult.npz --key_rot key_rot.npz \
        --input ct.npz --output out.npz [--algo direct] [--N 128]

The reference CLI fixes N=128 (main.cpp:36) and DirectSort with
CompositeSignConfig(4,3,3) (sort.h:86); both are flags here.
"""

from __future__ import annotations

import argparse
import sys
import time

from . import serial
from .core.ckks import CkksContext, Ciphertext
from .ops.sign import SignConfig, CompositeSignConfig


class SortContext:
    """Deserialize -> blind sort -> serialize (sort.h:15-103)."""

    ALGOS = ("direct", "hybrid", "hybrid1", "hybrid2", "bitonic")

    def __init__(self, cc_file, pub_key_file, mult_key_file, rot_key_file,
                 array_file, output_file):
        self.ctx: CkksContext = serial.load_eval_context(
            cc_file, pub_key_file, mult_key_file, rot_key_file)
        self.input_ct: Ciphertext = serial.load_ciphertext(array_file)
        self.output_file = output_file
        self.output_ct: Ciphertext | None = None

    def eval(self, algo: str, N: int,
             sign: tuple[int, int, int] = (4, 3, 3),
             mult_depth: int | None = None) -> Ciphertext:
        """Run the requested pipeline on the deserialized ciphertext
        (sort.h:76-95 eval; sign default = reference's Cfg(4,3,3))."""
        cfg = SignConfig(CompositeSignConfig(*sign),
                         mult_depth=mult_depth or self.ctx.cfg.mult_depth)
        rot_available = sorted(self.ctx.rot_keys)
        if algo == "bitonic":
            from .models.bitonic import BitonicSort
            model = BitonicSort(self.ctx, N, rot_indices=rot_available)
            self.output_ct = model.sort(self.input_ct, cfg)
        elif algo in ("direct", "hybrid", "hybrid1", "hybrid2"):
            from .models.direct_sort import DirectSort
            model = DirectSort(self.ctx, N, rot_indices=rot_available)
            fn = {"direct": model.sort, "hybrid": model.sort_hybrid,
                  "hybrid1": model.sort_hybrid1,
                  "hybrid2": model.sort_hybrid2}[algo]
            self.output_ct = fn(self.input_ct, cfg)
        else:
            raise ValueError(f"unknown algo {algo!r}; one of {self.ALGOS}")
        return self.output_ct

    def serialize_output(self) -> None:
        """Write the result ciphertext (sort.h:97-102)."""
        assert self.output_ct is not None, "call eval() first"
        serial.save_ciphertext(self.output_file, self.output_ct)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="sorting_fhe_tpu",
        description="Blind homomorphic sort over serialized CKKS artifacts")
    ap.add_argument("--cc", required=True, help="context params JSON")
    ap.add_argument("--key_pub", required=True, help="public key .npz")
    ap.add_argument("--key_mult", required=True, help="relin key .npz")
    ap.add_argument("--key_rot", required=True, help="rotation keys .npz")
    ap.add_argument("--input", required=True, help="input ciphertext .npz")
    ap.add_argument("--output", required=True, help="output ciphertext .npz")
    ap.add_argument("--algo", default="direct", choices=SortContext.ALGOS)
    ap.add_argument("--N", type=int, default=128,
                    help="array size (reference fixes 128, main.cpp:36)")
    args = ap.parse_args(argv)

    t0 = time.time()
    sc = SortContext(args.cc, args.key_pub, args.key_mult, args.key_rot,
                     args.input, args.output)
    print(f"[driver] context + keys + input deserialized in "
          f"{time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    sc.eval(args.algo, args.N)
    print(f"[driver] {args.algo} sort N={args.N}: {time.time()-t0:.1f}s "
          f"(mults={sc.ctx.mult_count} rots={sc.ctx.rot_count})",
          file=sys.stderr)
    sc.serialize_output()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
