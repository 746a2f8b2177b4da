"""Golden-file checks for deterministic queries that have no SQL oracle.

Five registry queries are built on engine-internal hash/DSP families DuckDB
cannot replicate (``xxhash64`` MinHash/SimHash signatures, seeded-LCG LSH
hyperplanes, numpy rFFT) — but every one of them is *fully deterministic*:
fixed hash functions, seeded planes, synthesized PCM. Rows-only checking
undersells them; this module pins their exact output instead.

A golden file commits, per (query, sf tag):

- sha256 fingerprints of the input parquet files the query reads, so a
  driver-side testdata regeneration invalidates the golden *visibly*
  (reported as ``golden_stale_inputs`` and downgraded to a rows-only check,
  never a spurious FAIL against outputs of different inputs);
- the result row count, column names, and the same order-insensitive
  canonical value hash the oracle gate uses (``oracle_compare.hash_rows``)
  — exact equality, byte-for-byte, without committing tens of thousands of
  result rows.

Regenerate after an intentional behavior change with::

    python scripts/check_oracle.py --update-golden <sf_dir>
"""

from __future__ import annotations

import hashlib
import json
import os

from .oracle_compare import hash_rows

# query -> the sf-dir parquet tables whose bytes determine its output
GOLDEN_QUERIES: dict[str, list[str]] = {
    "dedup_minhash_lsh": ["documents"],
    "dedup_simhash_hamming": ["documents"],
    "sim_lsh_hyperplane": ["embeddings"],
    "sim_lsh_multiprobe": ["embeddings"],
    "mm_audio_psd_peak": ["documents"],
    "mm_audio_wav_decode": ["documents"],
    "mm_image_bmp_decode": ["documents"],
    "mm_audio_spectrogram": ["documents"],
    "mm_image_phash_dedup": ["documents"],
}

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden",
)


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


def golden_path(name: str, sf_dir: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}__{_sf_tag(sf_dir)}.json")


# (abspath, size, mtime_ns) -> sha256 — several goldens share input files
# (documents.parquet feeds four queries), so one gate run would otherwise
# re-stream the largest inputs once per query
_FP_CACHE: dict[tuple[str, int, int], str] = {}


def input_fingerprints(sf_dir: str, tables: list[str]) -> dict[str, str]:
    out = {}
    for t in tables:
        path = os.path.abspath(os.path.join(sf_dir, f"{t}.parquet"))
        st = os.stat(path)
        key = (path, st.st_size, st.st_mtime_ns)
        if key not in _FP_CACHE:
            h = hashlib.sha256()
            with open(path, "rb") as fh:
                for chunk in iter(lambda: fh.read(1 << 20), b""):
                    h.update(chunk)
            _FP_CACHE[key] = h.hexdigest()
        out[t] = _FP_CACHE[key]
    return out


def load_golden(name: str, sf_dir: str) -> dict | None:
    path = golden_path(name, sf_dir)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def record_golden(
    name: str, sf_dir: str, cols: list[str], rows: list[tuple]
) -> str:
    """Write the golden file for ``name`` at this sf dir; returns the path."""
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = golden_path(name, sf_dir)
    payload = {
        "query": name,
        "sf_tag": _sf_tag(sf_dir),
        "inputs": input_fingerprints(sf_dir, GOLDEN_QUERIES[name]),
        "n_rows": len(rows),
        "columns": sorted(cols),
        "value_hash": hash_rows(cols, rows),
    }
    with open(path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    return path


def check_golden(
    golden: dict, sf_dir: str, cols: list[str], rows: list[tuple]
) -> tuple[str, list[str]]:
    """Compare a fetched result against a golden record.

    Returns ``(status, problems)`` where status is ``"ok"`` (exact match),
    ``"stale"`` (input parquet bytes differ from when the golden was
    recorded — the golden proves nothing about these inputs), or ``"fail"``
    (same inputs, different output: a real regression).
    """
    current = input_fingerprints(sf_dir, list(golden["inputs"].keys()))
    if current != golden["inputs"]:
        return "stale", [
            "input fingerprints differ from golden; regenerate with "
            "check_oracle.py --update-golden"
        ]
    problems = []
    if len(rows) != golden["n_rows"]:
        problems.append(f"rowcount {len(rows)} != golden {golden['n_rows']}")
    if sorted(cols) != golden["columns"]:
        problems.append(f"schema {sorted(cols)} != golden {golden['columns']}")
    if not problems and hash_rows(cols, rows) != golden["value_hash"]:
        problems.append("value-hash mismatch vs golden")
    return ("fail", problems) if problems else ("ok", [])
