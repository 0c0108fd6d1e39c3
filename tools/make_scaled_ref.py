"""Generate an N×-replicated copy of the reference song/log JSON
fixture for scaling probes of the star-schema flagship.

Usage: python tools/make_scaled_ref.py [out_dir] [factor]

Defaults: /tmp/dlws_ref_30 at factor 30. Pure stdlib (no Spark): the
source fixture is 4 MB / 101 files; replica k of every record gets

- an AFFINE letter cipher (same 312-bijection family as
  tools/make_scaled_sf.py) applied CONSISTENTLY to the join keys on
  both sides — song.title/artist_name and log.song/artist — so each
  log replica matches exactly its own song replica (per-replica join
  fan-out preserved, zero cross-replica matches);
- ciphered song_id/artist_id/firstName/lastName (dims grow N×),
- userId offset by k·100_000, sessionId by k·1_000_000 (disjoint),
- ts offset by k ms (the distinct-ts time dimension grows N× rather
  than saturating — the pessimistic shape for the time-table shuffle).

Replica 0 is the identity. Output is NDJSON packed one file per
(dataset, replica) rather than the reference's one-object-per-file
layout: at probe scale the one-file-per-song layout measures file
listing, not the pipeline (bench keeps the real layout at 1× via
/root/reference/data). Output lands OUTSIDE the repo (/tmp).
"""

from __future__ import annotations

import glob
import json
import os
import sys

ALPHA = "abcdefghijklmnopqrstuvwxyz"
COPRIMES = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)


def cipher_table(k: int) -> dict[int, str] | None:
    if k == 0:
        return None
    if k >= 26 * len(COPRIMES):
        raise ValueError(f"factor exceeds {26 * len(COPRIMES)} distinct ciphers")
    a, b = COPRIMES[k // 26], k % 26
    lo = "".join(ALPHA[(a * i + b) % 26] for i in range(26))
    return str.maketrans(ALPHA + ALPHA.upper(), lo + lo.upper())


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dlws_ref_30"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    src = "/root/reference/data"

    songs = []
    for p in sorted(glob.glob(f"{src}/song-data/*/*/*/*.json")):
        with open(p) as f:
            for line in f:
                if line.strip():
                    songs.append(json.loads(line))
    logs = []
    for p in sorted(glob.glob(f"{src}/log-data/*.json")):
        with open(p) as f:
            for line in f:
                if line.strip():
                    logs.append(json.loads(line))

    os.makedirs(f"{out}/song-data", exist_ok=True)
    os.makedirs(f"{out}/log-data", exist_ok=True)

    def c(v, tr):
        return v.translate(tr) if tr is not None and isinstance(v, str) else v

    for k in range(factor):
        tr = cipher_table(k)
        with open(f"{out}/song-data/part-{k:05d}.json", "w") as f:
            for s in songs:
                r = dict(s)
                for fld in ("song_id", "artist_id", "title", "artist_name",
                            "artist_location"):
                    r[fld] = c(r[fld], tr)
                f.write(json.dumps(r) + "\n")
        with open(f"{out}/log-data/part-{k:05d}.json", "w") as f:
            for e in logs:
                r = dict(e)
                for fld in ("song", "artist", "firstName", "lastName",
                            "location"):
                    r[fld] = c(r[fld], tr)
                if isinstance(r.get("ts"), int):
                    r["ts"] = r["ts"] + k
                if isinstance(r.get("sessionId"), int):
                    r["sessionId"] = r["sessionId"] + k * 1_000_000
                u = r.get("userId")
                if isinstance(u, str) and u.strip().isdigit():
                    r["userId"] = str(int(u) + k * 100_000)
                f.write(json.dumps(r) + "\n")

    print(f"wrote {factor}x fixture to {out}: {len(songs)} songs/replica, "
          f"{len(logs)} log events/replica")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
