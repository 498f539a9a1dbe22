"""Porter stemmer.

Implements Martin Porter's classic 1980 stemming algorithm with the exact
behavior of the variant the reference engine uses (reference:
``analysis/PorterStemmer.java`` — the Lucene port of Porter's original,
public-domain implementation), including:

- words of length <= 2 are returned unchanged (``stem(): k > k0+1`` guard),
- terminal-y handling in step 2 (y -> i when a vowel precedes),
- the "Bug 1" guards in steps 3/5 (no-op on single-char buffers) and the
  "Bug 2" ``j >= 0`` guard on the ``-ion`` rule,
- golden behavior: ``"computer science"`` stems to ``"comput scienc"``
  (reference test ``analysis/stemmer/PorterStemmerTest.java:20-27``).

The implementation operates on a mutable character buffer with the same
(k0, j, k) index discipline as the published algorithm so that every rule
fires under identical conditions. Inputs are assumed to be lowercase (the
tokenizers lowercase before stemming, as the reference analyzers do).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


class PorterStemmer:
    """Stateful stemmer instance; reusable across calls (one per actor)."""

    __slots__ = ("b", "k", "k0", "j", "_cache")

    def __init__(self, cache_size: int | None = 1_000_000):
        self.b: list[str] = []
        self.k = 0
        self.k0 = 0
        self.j = 0
        # memo: web vocab is Zipfian, so a per-actor cache turns per-token
        # Python cost into a dict hit for all but first occurrences.
        self._cache: dict[str, str] | None = {} if cache_size else None

    # --- condition helpers (Porter's cons/m/vowelinstem/doublec/cvc) ---

    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == self.k0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        n = 0
        i = self.k0
        while True:
            if i > self.j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > self.j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > self.j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowelinstem(self) -> bool:
        for i in range(self.k0, self.j + 1):
            if not self._cons(i):
                return True
        return False

    def _doublec(self, j: int) -> bool:
        if j < self.k0 + 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < self.k0 + 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < self.k0:
            return False
        for i in range(l):
            if self.b[o + i] != s[i]:
                return False
        self.j = self.k - l
        return True

    def _setto(self, s: str) -> None:
        o = self.j + 1
        for i, ch in enumerate(s):
            idx = o + i
            if idx < len(self.b):
                self.b[idx] = ch
            else:
                self.b.append(ch)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    # --- the six steps ---

    def _step1(self) -> None:
        b = self.b
        if b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowelinstem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                ch = b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step2(self) -> None:
        if self._ends("y") and self._vowelinstem():
            self.b[self.k] = "i"

    _STEP3 = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def _step3(self) -> None:
        if self.k == self.k0:
            return  # "Bug 1" guard
        rules = self._STEP3.get(self.b[self.k - 1])
        if not rules:
            return
        for suffix, repl in rules:
            if self._ends(suffix):
                self._r(repl)
                return

    _STEP4 = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def _step4(self) -> None:
        rules = self._STEP4.get(self.b[self.k])
        if not rules:
            return
        for suffix, repl in rules:
            if self._ends(suffix):
                self._r(repl)
                return

    def _step5(self) -> None:
        if self.k == self.k0:
            return  # "Bug 1" guard
        ch = self.b[self.k - 1]
        if ch == "a":
            if not self._ends("al"):
                return
        elif ch == "c":
            if not (self._ends("ance") or self._ends("ence")):
                return
        elif ch == "e":
            if not self._ends("er"):
                return
        elif ch == "i":
            if not self._ends("ic"):
                return
        elif ch == "l":
            if not (self._ends("able") or self._ends("ible")):
                return
        elif ch == "n":
            if not (
                self._ends("ant")
                or self._ends("ement")
                or self._ends("ment")
                or self._ends("ent")
            ):
                return
        elif ch == "o":
            if self._ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"):
                pass  # "Bug 2" j >= 0 guard
            elif not self._ends("ou"):
                return
        elif ch == "s":
            if not self._ends("ism"):
                return
        elif ch == "t":
            if not (self._ends("ate") or self._ends("iti")):
                return
        elif ch == "u":
            if not self._ends("ous"):
                return
        elif ch == "v":
            if not self._ends("ive"):
                return
        elif ch == "z":
            if not self._ends("ize"):
                return
        else:
            return
        if self._m() > 1:
            self.k = self.j

    def _step6(self) -> None:
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1

    # --- public API ---

    def stem(self, word: str) -> str:
        """Stem one (lowercase) word. Words of length <= 2 are unchanged."""
        if self._cache is not None:
            hit = self._cache.get(word)
            if hit is not None:
                return hit
        if len(word) <= 2:
            result = word
        else:
            self.b = list(word)
            self.k = len(word) - 1
            self.k0 = 0
            self._step1()
            self._step2()
            self._step3()
            self._step4()
            self._step5()
            self._step6()
            result = "".join(self.b[: self.k + 1])
        if self._cache is not None:
            if len(self._cache) > 1_000_000:
                self._cache.clear()
            self._cache[word] = result
        return result

    # Analyzer protocol hook
    __call__ = stem
