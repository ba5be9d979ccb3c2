"""Model checksum generation/verification (the reference's SHA256SUMS flow,
README.md:269-275: `sha256sum --check SHA256SUMS` over model files).

usage: python tools/sha256sums.py generate models/**/*.bin > SHA256SUMS
       python tools/sha256sums.py check SHA256SUMS
"""

from __future__ import annotations

import hashlib
import sys


def sha256_file(path: str, bufsize: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(bufsize):
            h.update(chunk)
    return h.hexdigest()


def main(argv: list[str]) -> int:
    if len(argv) < 2 or argv[0] not in ("generate", "check"):
        print(__doc__, file=sys.stderr)
        return 2
    if argv[0] == "generate":
        for path in argv[1:]:
            print(f"{sha256_file(path)}  {path}")
        return 0
    failed = 0
    with open(argv[1]) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            want, path = line.split(None, 1)
            try:
                got = sha256_file(path)
            except OSError as e:
                print(f"{path}: MISSING ({e})")
                failed += 1
                continue
            ok = got == want
            print(f"{path}: {'OK' if ok else 'FAILED'}")
            failed += 0 if ok else 1
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
