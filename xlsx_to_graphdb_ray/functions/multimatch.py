"""Multi-pattern substring matching (Aho-Corasick automaton).

Scale replacement for the reference's J9 naive containment loop
(``scripts/mcp/ingest_changes.py:121-168``), which scans every change
description once **per entity name** — O(entities × changes) work. The
automaton preserves the exact naive-substring semantics (including the
prefix double-match quirk: a name that is a prefix/infix of another name
still matches) while scanning each description ONCE: O(len(text)) automaton
steps per description, independent of dictionary size.

Topology at scale: the automaton is built once per worker process from the
broadcast (id, name) list — O(total pattern chars) memory, amortized across
all batches that worker handles — so a 10^7-entity dictionary costs one
build per worker, not one scan per entity per batch.

Aho-Corasick (1975) is a public textbook algorithm; this is a from-scratch
dict-goto implementation.
"""

from __future__ import annotations


class AhoCorasick:
    """Set-of-substrings matcher: ``scan(text)`` returns the indices of all
    patterns occurring as substrings of ``text`` (each at most once)."""

    def __init__(self, patterns: list[str]):
        # goto[s] : dict char -> next state; root = 0
        goto: list[dict[str, int]] = [{}]
        out: list[tuple[int, ...]] = [()]
        for idx, pat in enumerate(patterns):
            s = 0
            for ch in pat:
                nxt = goto[s].get(ch)
                if nxt is None:
                    goto.append({})
                    out.append(())
                    nxt = len(goto) - 1
                    goto[s][ch] = nxt
                s = nxt
            if pat:  # empty pattern would match everywhere; dictionary has none
                out[s] = out[s] + (idx,)
        # BFS fail links, merging suffix outputs so nested patterns
        # (the prefix double-match quirk) are reported at the longer match.
        fail = [0] * len(goto)
        queue: list[int] = []
        for s in goto[0].values():
            queue.append(s)
        qi = 0
        while qi < len(queue):
            u = queue[qi]
            qi += 1
            for ch, v in goto[u].items():
                queue.append(v)
                f = fail[u]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[v] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != v else 0
                if out[fail[v]]:
                    out[v] = out[v] + out[fail[v]]
        self._goto = goto
        self._fail = fail
        self._out = out

    def scan(self, text: str) -> set[int]:
        """Indices of every pattern that is a substring of ``text``."""
        goto, fail, out = self._goto, self._fail, self._out
        s = 0
        found: set[int] = set()
        for ch in text:
            nxt = goto[s].get(ch)
            while nxt is None and s:
                s = fail[s]
                nxt = goto[s].get(ch)
            s = nxt if nxt is not None else 0
            if out[s]:
                found.update(out[s])
        return found
