"""Explicit build entry point for the native host kernels.

    python -m terrain_diffusion_tpu.native.build [--force]

Compiles ``src/{portable_rng,perlin}.cpp`` into ``libterrain_native.so``
with portable flags (set ``TDTPU_NATIVE_MARCH=native`` for arch-specific
codegen).  Importing ``terrain_diffusion_tpu.native`` never compiles; it
only loads the library this command produced.
"""
import sys

from terrain_diffusion_tpu import native


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    force = "--force" in argv
    try:
        path = native.build(force=force)
    except RuntimeError as e:
        print(f"native build failed: {e}", file=sys.stderr)
        return 1
    print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
