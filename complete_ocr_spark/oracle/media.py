"""Pure-Python oracle for the media perceptual-dedup tier — an INDEPENDENT
transcription (no numpy pooling shared with the Spark kernel, brute-force
all-pairs instead of banding, union-find instead of label propagation) so
golden equality is a genuine cross-implementation check, the
oracle/reference_oracle.py pattern.

Decode mirrors multimodal._fake_decode's contract (np.resize tiling of the
payload keystream) in plain Python; pooling uses the same linspace cell
edges computed by hand.
"""

from __future__ import annotations


def _decode_frame(payload: bytes, width: int, height: int,
                  n_frames: int = 1, frame: int = 0) -> list[list[int]]:
    # the kernel tiles the payload to the FULL n_frames*h*w before slicing
    # (np.resize semantics), so frame k's bytes depend on n_frames
    need = n_frames * width * height
    data = bytearray(payload)
    if not data:  # np.resize of an empty buffer yields zeros
        data = bytearray(need)
    elif len(data) < need:  # np.resize semantics: tile the buffer
        reps = need // len(data) + 1
        data = (data * reps)[:need]
    base = frame * width * height
    return [
        [data[base + r * width + c] for c in range(width)]
        for r in range(height)
    ]


def _decode_first_frame(payload: bytes, width: int, height: int) -> list[list[int]]:
    return _decode_frame(payload, width, height)


def _edges(n: int, grid: int) -> list[int]:
    # integer-cast linspace(0, n, grid+1), matching np.linspace(...).astype(int)
    return [int(i * n / grid) for i in range(grid + 1)]


def avg_hash_py(payload: bytes, width: int, height: int, grid: int = 8) -> int:
    px = _decode_first_frame(payload, width, height)
    ys, xs = _edges(height, grid), _edges(width, grid)
    means = []
    for i in range(grid):
        for j in range(grid):
            vals = [
                px[r][c]
                for r in range(ys[i], ys[i + 1])
                for c in range(xs[j], xs[j + 1])
            ]
            if vals:
                means.append(sum(vals) / len(vals))
            else:  # sub-grid frame: nearest pixel at the clamped cell origin
                means.append(
                    float(px[min(ys[i], height - 1)][min(xs[j], width - 1)])
                )
    overall = sum(means) / len(means)
    out = 0
    for k, m in enumerate(means):
        if m > overall:
            out |= 1 << k
    return out


def near_dup_clusters(rows, max_hamming: int = 3):
    """rows: (media_ref, width, height, payload) -> sorted
    (media_ref, dup_of, n_members) via brute-force all-pairs Hamming +
    union-find."""
    sigs = {mr: avg_hash_py(p, w, h) for mr, w, h, p in rows}
    refs = sorted(sigs)
    parent = {r: r for r in refs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    linked = set()
    for i, a in enumerate(refs):
        for b in refs[i + 1:]:
            if bin(sigs[a] ^ sigs[b]).count("1") <= max_hamming:
                linked.update((a, b))
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for r in linked:
        clusters.setdefault(find(r), []).append(r)
    out = []
    for root, members in clusters.items():
        for m in members:
            out.append((m, min(members), len(members)))
    return sorted(out)


def avg_hash_frame_py(payload: bytes, width: int, height: int,
                      n_frames: int, frame: int, grid: int = 8) -> int:
    px = _decode_frame(payload, width, height, n_frames, frame)
    ys, xs = _edges(height, grid), _edges(width, grid)
    means = []
    for i in range(grid):
        for j in range(grid):
            vals = [
                px[r][c]
                for r in range(ys[i], ys[i + 1])
                for c in range(xs[j], xs[j + 1])
            ]
            if vals:
                means.append(sum(vals) / len(vals))
            else:
                means.append(
                    float(px[min(ys[i], height - 1)][min(xs[j], width - 1)])
                )
    overall = sum(means) / len(means)
    out = 0
    for k, m in enumerate(means):
        if m > overall:
            out |= 1 << k
    return out


def frame_near_dup_pairs(rows, max_hamming: int = 3, sep: str = "\x1f"):
    """rows: (media_ref, width, height, n_frames, payload) -> sorted
    (doc1, doc2, hamming) over ALL frame pairs within max_hamming, via
    brute-force all-pairs popcount (doc = media_ref<sep>zero-padded idx)."""
    sigs = {}
    for mr, w, h, nf, p in rows:
        for k in range(nf):
            sigs[f"{mr}{sep}{k:06d}"] = avg_hash_frame_py(p, w, h, nf, k)
    docs = sorted(sigs)
    out = []
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= max_hamming:
                out.append((a, b, ham))
    return sorted(out)
