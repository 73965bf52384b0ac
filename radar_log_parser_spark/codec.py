"""Deterministic token codec: token ids ↔ text.

The engine's input table (BASELINE.json ``input_hint``) carries pre-tokenized
lines as ``tokens: array<int32>``. The codec defines the vocabulary used by
the fixture generator and by the decode stage. It is a whitespace word codec:
``decode(ids) == " ".join(inv_vocab[id] for id in ids)`` and must round-trip
the original line byte-for-byte (the generator asserts this).

Design for scale: the vocabulary is shipped to executors once (Spark
broadcast of a numpy object array), and decode is a vectorized ``np.take`` +
join inside an Arrow batch — never a join against a vocab table and never
per-row Python.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


@dataclass(frozen=True)
class Vocab:
    """Immutable token vocabulary. ids are dense [0, n)."""

    token_to_id: dict[str, int]
    id_to_token: tuple[str, ...]

    @staticmethod
    def build(lines: list[str]) -> "Vocab":
        """Vocab = sorted unique whitespace-delimited tokens of the corpus,
        plus per-character fallback entries (FIXTURES.md §3). ids assigned in
        sorted order — fully deterministic."""
        words: set[str] = set()
        for line in lines:
            words.update(line.split(" "))
        chars = {c for w in words for c in w}
        all_tokens = sorted(words | chars)
        t2i = {t: i for i, t in enumerate(all_tokens)}
        return Vocab(t2i, tuple(all_tokens))

    def encode(self, line: str) -> list[int]:
        out: list[int] = []
        for w in line.split(" "):
            tid = self.token_to_id.get(w)
            if tid is not None:
                out.append(tid)
            else:  # per-character fallback (chars of corpus words are always present)
                out.extend(self.token_to_id[c] for c in w)
        return out

    def decode(self, ids: list[int]) -> str:
        inv = self.id_to_token
        return " ".join(inv[i] for i in ids)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.token_to_id, f, sort_keys=True)

    @staticmethod
    def load(path: str) -> "Vocab":
        with open(path) as f:
            t2i = json.load(f)
        inv = [""] * len(t2i)
        for t, i in t2i.items():
            inv[i] = t
        return Vocab({t: int(i) for t, i in t2i.items()}, tuple(inv))

    def __len__(self) -> int:  # pragma: no cover
        return len(self.id_to_token)
