#!/usr/bin/env python3
"""Build the parity oracle: the reference engine with its two UB bugs patched.

The pristine reference cannot execute a single EASY reset on glibc/GCC-12:

1. map.cpp:727 erases ``valid_indices.begin() + <piece index>`` where the
   piece index can exceed the vector size — ``vector::erase`` past-the-end is
   a negative-size ``memmove`` (ASan: "negative-size-param (size=-48)",
   observed on every EASY seed we tried) that corrupts the heap and aborts.
   Intended semantics (sampling without replacement) erases the *position*
   that was just drawn; the patch does exactly that. RNG consumption is
   unchanged.
2. map.cpp:343-354 ``add_players`` writes ``player_locations[i]`` for every
   start hex ``i`` whose player number is in range, but the vector is sized
   ``n_players`` — for <4 players on the B start piece this writes out of
   bounds (heap clobber). The patch skips the OOB writes, preserving the
   observable in-bounds behaviour (players whose start hex index >= n_players
   keep the default location {0,0}).

Everything else is byte-identical reference source. The oracle is built
out-of-tree (never shipped); its dumps are the goldens for eldorado_tpu's
bit-exact parity tests.

Usage: make_oracle.py <workdir>   # copies+patches into <workdir>/refsrc
"""
import pathlib
import shutil
import subprocess
import sys

REF = pathlib.Path("/root/reference")

PATCHES = [
    # (file, old, new)
    (
        "src/map.cpp",
        "      next_idx = valid_indices[std::uniform_int_distribution<size_t>(\n"
        "          0, valid_indices.size() - 1)(rng)];",
        "      next_pos = std::uniform_int_distribution<size_t>(\n"
        "          0, valid_indices.size() - 1)(rng);\n"
        "      next_idx = valid_indices[next_pos];",
    ),
    (
        "src/map.cpp",
        "    size_t next_idx;",
        "    size_t next_idx;\n    size_t next_pos = 0;",
    ),
    (
        "src/map.cpp",
        "      valid_indices.erase(valid_indices.begin() + static_cast<long>(next_idx));",
        "      valid_indices.erase(valid_indices.begin() + static_cast<long>(next_pos));",
    ),
    (
        "src/map.cpp",
        "    if ((start > 0) && (start < n_players + 1)) {",
        "    if ((start > 0) && (start < n_players + 1) && (i < n_players)) {",
    ),
    # toolchain shims (the reference's attribute/alignas ordering and its
    # fallback "#define __attribute__" don't compile on g++ 12)
    ("include/api.h", "CITYOFGOLD_API ", ""),
    ("include/environment.h", "CITYOFGOLD_API ", ""),
    ("include/sampler.h", "CITYOFGOLD_API ", ""),
    (
        "include/api.h",
        '#define __attribute__((visibility("default")))',
        "// (removed broken fallback #define)",
    ),
]


def main(workdir: str) -> None:
    dst = pathlib.Path(workdir) / "refsrc"
    if dst.exists():
        shutil.rmtree(dst)
    dst.mkdir(parents=True)
    for sub in ("include", "src"):
        shutil.copytree(REF / sub, dst / sub)
    for fname, old, new in PATCHES:
        p = dst / fname
        text = p.read_text()
        if old not in text:
            if new in text or new.replace("CITYOFGOLD_API ", "") in text:
                continue
            raise SystemExit(f"patch target not found in {fname}: {old[:60]!r}")
        p.write_text(text.replace(old, new))
    print(f"oracle source at {dst}")
    # smoke-compile
    subprocess.run(
        ["g++", "-fsyntax-only", "-std=c++20", f"-I{dst}/include",
         "-Wno-interference-size", str(dst / "src/map.cpp")],
        check=True,
    )
    print("syntax ok")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/oracle")
