"""Analysis-chain tests: golden vectors ported from the reference test suite
(see FIXTURES.md §F4) plus batch/row equivalence checks."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from searchengine_ray.analysis import (
    NAIVE,
    NO_BREAK_MSG,
    PUNCT_ONLY,
    PUNCT_PORTER,
    ComposableAnalyzer,
    NaiveAnalyzer,
    PorterStemmer,
    PunctuationTokenizer,
    TermMapper,
    WordBreakCJKTokenizer,
    WordBreakTokenizer,
    analyze_docs,
    default_analyzer,
)
from searchengine_ray.analysis.stopwords import EN_STOP_WORDS, JA_STOP_WORDS


class TestPunctuationTokenizer:
    # golden: analysis/punctuation/PunctuationTokenizerTest.java:14-20
    def test_reference_golden(self):
        assert PunctuationTokenizer().tokenize("I am Happy Today!") == ["happy", "today"]

    def test_punctuation_replaced(self):
        assert PunctuationTokenizer().tokenize("cat,dog;bird.fish?cow!ox") == [
            "cat", "dog", "bird", "fish", "cow", "ox",
        ]

    def test_whitespace_variants(self):
        assert PunctuationTokenizer().tokenize("cat\tdog\nbird\r\fox") == [
            "cat", "dog", "bird", "ox",
        ]

    def test_stopwords_removed_empty_dropped(self):
        assert PunctuationTokenizer().tokenize("the a an , . !") == []
        assert PunctuationTokenizer().tokenize("") == []

    def test_unsplit_punctuation_kept(self):
        # only , . ; ? ! are separators — e.g. ' and - are not
        assert PunctuationTokenizer().tokenize("o'brien-smith") == ["o'brien-smith"]


class TestStopwords:
    def test_counts_match_reference(self):
        # analysis/StopWords.java — 127 EN + 44 JA entries
        assert len(EN_STOP_WORDS) == 127
        assert len(JA_STOP_WORDS) == 44

    def test_spot_members(self):
        for w in ("i", "the", "now", "don", "s", "t", "しかし", "は"):
            assert w in EN_STOP_WORDS | JA_STOP_WORDS


class TestPorterStemmer:
    # golden: analysis/stemmer/PorterStemmerTest.java:20-27
    def test_reference_sentence_golden(self):
        s = PorterStemmer()
        src = "stemming is an important concept in computer science".split()
        expect = "stem is an import concept in comput scienc".split()
        assert [s.stem(w) for w in src] == expect

    @pytest.mark.parametrize(
        "word,stem",
        [
            # step1 examples from the published algorithm
            ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
            ("caress", "caress"), ("cats", "cat"), ("feed", "feed"),
            ("agreed", "agre"), ("disabled", "disabl"), ("matting", "mat"),
            ("mating", "mate"), ("meeting", "meet"), ("milling", "mill"),
            ("messing", "mess"), ("meetings", "meet"),
            # misc classic vectors
            ("relational", "relat"), ("conditional", "condit"),
            ("rational", "ration"), ("valenci", "valenc"),
            ("digitizer", "digit"), ("operator", "oper"),
            ("feudalism", "feudal"), ("decisiveness", "decis"),
            ("hopefulness", "hope"), ("formaliti", "formal"),
            ("formative", "form"), ("formalize", "formal"),
            ("electriciti", "electr"), ("electrical", "electr"),
            ("hopeful", "hope"), ("goodness", "good"),
            ("revival", "reviv"), ("allowance", "allow"),
            ("inference", "infer"), ("airliner", "airlin"),
            ("gyroscopic", "gyroscop"), ("adjustable", "adjust"),
            ("defensible", "defens"), ("irritant", "irrit"),
            ("replacement", "replac"), ("adjustment", "adjust"),
            ("dependent", "depend"), ("adoption", "adopt"),
            ("homologou", "homolog"), ("communism", "commun"),
            ("activate", "activ"), ("angulariti", "angular"),
            ("homologous", "homolog"), ("effective", "effect"),
            ("bowdlerize", "bowdler"), ("probate", "probat"),
            ("rate", "rate"), ("cease", "ceas"),
            # short words unchanged (k > k0+1 guard)
            ("is", "is"), ("be", "be"), ("a", "a"), ("sky", "sky"),
        ],
    )
    def test_vectors(self, word, stem):
        assert PorterStemmer().stem(word) == stem

    def test_cache_consistency(self):
        s = PorterStemmer()
        assert s.stem("running") == s.stem("running") == "run"


class TestAnalyzers:
    def test_composable_chain(self):
        ana = default_analyzer()
        assert ana.analyze("Stemming is an important concept in Computer Science!") == [
            "stem", "import", "concept", "comput", "scienc",
        ]

    def test_naive_java_split_edges(self):
        ana = NaiveAnalyzer()
        assert ana.analyze("The Quick  fox") == ["the", "quick", "fox"]
        assert ana.analyze(" leading space") == ["", "leading", "space"]
        assert ana.analyze("trailing  ") == ["trailing"]


def _en_dict():
    # deterministic synthetic frequency dictionary (no reference data copied)
    return {
        "cat": 100.0, "and": 500.0, "dog": 120.0, "sand": 30.0,
        "a": 900.0, "i": 800.0, "ai": 10.0, "an": 200.0, "d": 5.0,
        "dogs": 20.0, "og": 1.0, "s": 50.0, "it": 300.0, "is": 400.0,
        "rain": 60.0, "in": 700.0, "ing": 90.0, "raining": 25.0,
    }


class TestWordBreak:
    def test_cat_and_dog(self):
        tok = WordBreakTokenizer(_en_dict())
        # "and" is a stop word → removed after segmentation
        assert tok.tokenize("catanddog") == ["cat", "dog"]

    def test_max_product_choice(self):
        # p(ai) vs p(a)*p(i): 10/T vs (900/T)*(800/T); T=4311 → p(a)*p(i)
        # = 0.2088*0.1856 = 0.0387 > p(ai)=0.00232 → ["a","i"] wins, both
        # stopwords → []
        tok = WordBreakTokenizer(_en_dict())
        assert tok.tokenize("ai") == []

    def test_unbreakable_raises(self):
        tok = WordBreakTokenizer(_en_dict())
        with pytest.raises(ValueError, match="no possible way"):
            tok.tokenize("catxdog")

    def test_empty_returns_empty(self):
        assert WordBreakTokenizer(_en_dict()).tokenize("") == []

    def test_case_insensitive_lowercase_out(self):
        assert WordBreakTokenizer(_en_dict()).tokenize("CatAndDog") == ["cat", "dog"]

    def test_long_input_no_underflow(self):
        # the reference DFS underflows/explodes here; our log-space DP must not
        tok = WordBreakTokenizer(_en_dict())
        text = "catanddog" * 120  # >1000 chars
        out = tok.tokenize(text)
        assert out == ["cat", "dog"] * 120


class TestWordBreakCJK:
    def _dict(self):
        return {"東京": 100.0, "京都": 80.0, "都": 20.0, "東": 10.0, "タワー": 50.0}

    def test_dag_segmentation(self):
        tok = WordBreakCJKTokenizer(self._dict())
        # 東京 + 都 beats 東 + 京都 iff p(東京)*p(都) > p(東)*p(京都):
        # 100*20 > 10*80 → ["東京","都"]
        assert tok.tokenize("東京都") == ["東京", "都"]

    def test_stopword_filtered(self):
        d = self._dict()
        d["の"] = 500.0
        tok = WordBreakCJKTokenizer(d)
        assert tok.tokenize("東京の東京") == ["東京", "東京"]

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="no possible way"):
            WordBreakCJKTokenizer(self._dict()).tokenize("")

    def test_unreachable_end_quirk(self):
        # reference predecessor-walk emits the whole string when unreachable
        tok = WordBreakCJKTokenizer(self._dict())
        assert tok.tokenize("xyz") == ["xyz"]


class TestBatchKernel:
    def test_matches_rowwise_analyzer(self):
        texts = [
            "I am Happy Today!",
            "Stemming is an important concept in computer science.",
            "the the the",  # all stopwords
            "",
            "cats and Dogs; dogs AND cats. running RUNNING runs!",
        ]
        mapper = TermMapper(PUNCT_PORTER)
        table = analyze_docs(texts, np.arange(len(texts)), mapper)
        ana = default_analyzer()
        for row_idx in range(len(texts)):
            toks = ana.analyze(texts[row_idx])
            expect_positions: dict[str, list[int]] = {}
            for pos, t in enumerate(toks):
                expect_positions.setdefault(t, []).append(pos)
            row_terms = table["terms"][row_idx].as_py()
            row_tfs = table["tfs"][row_idx].as_py()
            row_pos = table["positions"][row_idx].as_py()
            assert row_terms == sorted(expect_positions)
            assert table["dl"][row_idx].as_py() == len(toks)
            for t, tf, ps in zip(row_terms, row_tfs, row_pos):
                assert tf == len(expect_positions[t])
                assert ps == expect_positions[t]

    def test_punct_only_mode(self):
        mapper = TermMapper(PUNCT_ONLY)
        table = analyze_docs(["Cats and dogs!"], np.array([7]), mapper)
        assert table["terms"][0].as_py() == ["cats", "dogs"]
        assert table["doc_id"][0].as_py() == 7

    def test_naive_mode_keeps_stopwords(self):
        mapper = TermMapper(NAIVE)
        table = analyze_docs(["The cat"], np.array([0]), mapper)
        assert table["terms"][0].as_py() == ["cat", "the"]

    def test_empty_batch(self):
        table = analyze_docs([], np.array([], dtype=np.uint64), TermMapper())
        assert table.num_rows == 0

    def test_batch_split_invariance(self):
        texts = [f"doc number {i} cats dogs running {'spam ' * (i % 5)}" for i in range(20)]
        mapper = TermMapper(PUNCT_PORTER)
        whole = analyze_docs(texts, np.arange(20), mapper).to_pylist()
        parts = []
        for lo in range(0, 20, 7):
            chunk = texts[lo : lo + 7]
            parts.extend(
                analyze_docs(chunk, np.arange(lo, lo + len(chunk)), TermMapper()).to_pylist()
            )
        assert whole == parts


REF_EN_DICT = Path("/root/reference/src/main/resources/cs221_frequency_dictionary_en.txt")

SHERLOCK_1 = (
    "tosherlockholmessheisalwaysthewomanihaveseldomheardhimmentionherunderanyothernameinhiseyessheeclipsesandpredominatesthewholeofhersexitwasnotthathefeltanyemotionakintoloveforireneadlerallemotionsandthatoneparticularlywereabhorrenttohiscoldprecisebutadmirablybalancedmindhewasitakeitthemostperfectreasoningandobservingmachinethattheworldhasseenbutasaloverhewouldhaveplacedhimselfinafalsepositionheneverspokeofthesofterpassionssavewithagibeandasneertheywereadmirablethingsfortheobserverexcellentfordrawingtheveilfrommenmotivesandactionsbutforthetrainedreasonertoadmitsuchintrusionsintohisowndelicateandfinelyadjustedtemperamentwastointroduceadistractingfactorwhichmightthrowadoubtuponallhismentalresultsgritinasensitiveinstrumentoracrackinoneofhisownhighpowerlenseswouldnotbemoredisturbingthanastrongemotioninanaturesuchashisandyettherewasbutonewomantohimandthatwomanwasthelateireneadlerofdubiousandquestionablememory",
    "sherlock holmes always woman seldom heard mention name eyes eclipses predominates whole sex felt emotion akin love irene adler emotions one particularly abhorrent cold precise admirably balanced mind take perfect reasoning observing machine world seen lover would placed false position never spoke softer passions save gibe sneer admirable things observer excellent drawing veil men motives actions trained reasoner admit intrusions delicate finely adjusted temperament introduce distracting factor might throw doubt upon mental results grit sensitive instrument crack one high power lenses would disturbing strong emotion nature yet one woman woman late irene adler dubious questionable memory",
)
SHERLOCK_2 = (
    "ihadseenlittleofholmeslatelymymarriagehaddriftedusawayfromeachothermyowncompletehappinessandthehomecentredinterestswhichriseuparoundthemanwhofirstfindshimselfmasterofhisownestablishmentweresufficienttoabsorballmyattentionwhileholmeswholoathedeveryformofsocietywithhiswholesoulremainedinourlodgingsinbakerstreetburiedamonghisoldbooksandalternatingfromweektoweekbetweencocaineandambitionthedrowsinessofthedrugandthefierceenergyofhisownkeennaturehewasstillaseverdeeplyattractedbythestudyofcrimeandoccupiedhisimmensefacultiesandextraordinarypowersofobservationinfollowingoutthosecluesandclearingupthosemysterieswhichhadbeenabandonedashopelessbytheofficialpolicefromtimetotimeiheardsomevagueaccountofhisdoingsofhissummonstoodessainthecaseofthemurderofhisclearingupofthesingulartragedyoftheatkinsonbrothersattrincomaleeandfinallyofthemissionwhichhehadaccomplishedsodelicatelyandsuccessfullyforthereigningfamilyofhollandbeyondthesesignsofhisactivityhoweverwhichimerelysharedwithallthereadersofthedailypressiknewlittleofmyformerfriendandcompanion",
    "seen little holmes lately marriage drifted us away complete happiness home centred interests rise around man first finds master establishment sufficient absorb attention holmes loathed every form society whole soul remained lodgings baker street buried among old books alternating week week cocaine ambition drowsiness drug fierce energy keen nature still ever deeply attracted study crime occupied immense faculties extraordinary powers observation following clues clearing mysteries abandoned hopeless official police time time heard vague account doings summons odessa case murder clearing singular tragedy atkinson brothers trincomalee finally mission accomplished delicately successfully reigning family holland beyond signs activity however merely shared readers daily press knew little former friend companion",
)


@pytest.mark.skipif(not REF_EN_DICT.exists(), reason="reference dict not present")
class TestWordBreakReferenceDict:
    """M6 golden parity with the real 82k-entry frequency dictionary and
    the reference's Sherlock Holmes fixtures
    (``WordBreakTokenizerTest.java:50-78``; 20 s budget each there)."""

    @pytest.fixture(scope="class")
    def tok(self):
        from searchengine_ray.analysis.wordbreak import WordBreakTokenizer

        return WordBreakTokenizer(REF_EN_DICT)

    @pytest.mark.parametrize("case", [SHERLOCK_1, SHERLOCK_2], ids=["long1", "long2"])
    def test_sherlock_golden(self, tok, case):
        import time

        text, expected = case
        t0 = time.perf_counter()
        got = tok.tokenize(text)
        assert time.perf_counter() - t0 < 20.0  # reference latency budget
        assert got == expected.split(" ")

    def test_simple_golden(self, tok):
        # reference testWordBreak basic case
        assert tok.tokenize("catdog") == ["cat", "dog"]
