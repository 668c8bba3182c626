"""Deterministic regeneration of the reference's golden input dataset.

Replays the exact legacy-numpy RNG call sequence of the reference generator
(/root/reference/src/dataset.py:6-115, np.random.seed(42)) so tests can
reproduce `docs/data/dataset_raw.csv` without reading the reference tree.
Smaller variants (n_rows, seed) exercise suppression / all-bad-leaf paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

NAMES = ["Francesco", "Alessandro", "Lorenzo", "Mattia", "Leonardo", "Andrea",
         "Gabriele", "Matteo", "Tommaso", "Edoardo", "Sofia", "Giulia",
         "Aurora", "Alice", "Ginevra", "Emma", "Giorgia", "Greta", "Beatrice"]
SURNAMES = ["Rossi", "Russo", "Ferrari", "Esposito", "Bianchi", "Romano",
            "Colombo", "Ricci", "Marino", "Greco", "Bruno", "Gallo", "Conti",
            "De Luca", "Mancini", "Costa", "Giordano", "Rizzo"]


def _base_pattern(ptype: str, length: int = 8) -> np.ndarray:
    x = np.linspace(0, 1, length)
    if ptype == "Rising":
        start = np.random.uniform(5, 15)
        end = np.random.uniform(35, 45)
        return start + (end - start) * x
    if ptype == "Falling":
        start = np.random.uniform(35, 45)
        end = np.random.uniform(5, 15)
        return start + (end - start) * x
    if ptype == "Peak":
        base_val = np.random.uniform(10, 20)
        amp = np.random.uniform(20, 30)
        return base_val + amp * np.sin(np.linspace(0, np.pi, length))
    if ptype == "Flat":
        return np.full(length, np.random.uniform(20, 40))
    return np.zeros(length)


def generate_legacy_dataset(n_rows: int = 3000, seed: int = 42,
                            n_cols: int = 8) -> pd.DataFrame:
    np.random.seed(seed)
    rows = []
    for i in range(1, n_rows + 1):
        name = np.random.choice(NAMES)
        surname = np.random.choice(SURNAMES)
        ptype = np.random.choice(["Rising", "Falling", "Peak", "Flat"])
        ts = _base_pattern(ptype, n_cols)
        shift = np.random.uniform(-5, 5)
        noise = np.random.normal(0, 2, n_cols)
        ts_final = np.clip(ts + shift + noise, 0, 50).astype(int)
        total = np.sum(ts_final)
        perf = "Low" if total < 160 else ("Medium" if total <= 240 else "High")
        row = {"ID": i, "Name": name, "Surname": surname}
        for j in range(n_cols):
            row[f"H{j+1}"] = ts_final[j]
        row["Performance_SD"] = perf
        rows.append(row)
    return pd.DataFrame(rows)


def series_matrix(df: pd.DataFrame) -> np.ndarray:
    hcols = [c for c in df.columns if c.startswith("H")]
    return df[hcols].values
