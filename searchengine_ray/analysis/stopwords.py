"""Stop word lists.

Reproduces the reference's fixed list verbatim for behavior parity
(reference: ``analysis/StopWords.java:13-187`` — "Please use this list and
don't change it for uniform behavior in testing"). 127 English + 44 Japanese
entries.
"""

from __future__ import annotations

EN_STOP_WORDS: frozenset[str] = frozenset(
    """
    i me my myself we our ours ourselves you your yours yourself yourselves
    he him his himself she her hers herself it its itself they them their
    theirs themselves what which who whom this that these those am is are
    was were be been being have has had having do does did doing a an the
    and but if or because as until while of at by for with about against
    between into through during before after above below to from up down in
    out on off over under again further then once here there when where why
    how all any both each few more most other some such no nor not only own
    same so than too very s t can will just don should now
    """.split()
)

JA_STOP_WORDS: frozenset[str] = frozenset(
    [
        "これ", "それ", "あれ", "この", "その", "あの", "ここ", "そこ",
        "あそこ", "こちら", "どこ", "だれ", "なに", "なん", "何", "私",
        "貴方", "貴方方", "我々", "私達", "あの人", "あのかた", "彼女",
        "彼", "です", "あります", "おります", "います", "は", "が", "の",
        "に", "を", "で", "え", "から", "まで", "より", "も", "どの", "と",
        "し", "それで", "しかし",
    ]
)

STOP_WORDS: frozenset[str] = EN_STOP_WORDS | JA_STOP_WORDS
