"""Char-n-gram language identification (Cavnar & Trenkle 1994,
"N-Gram-Based Text Categorization") — the vendored-model lang-ID
backend for the seam in functions/tokenizers.py.

The fastText backend is import- and model-gated and unexercisable
offline; this backend makes the seam's contract testable with zero
dependencies: per-language rank-ordered character n-gram profiles
(n=1..3) trained on the small seed corpus embedded below, classified
by the out-of-place distance between the document profile and each
language profile. The seed corpus is ordinary sample prose written
for this repo (a few sentences per language — enough for the short-
document fixture texts; a production model trains the same structure
on real corpora).

Same languages as the oracled marker backend (operators/text.py
LANG_MARKERS): en, es, fr, de.
"""

from __future__ import annotations

from collections import Counter

#: Tiny seed corpus: a few sentences of ordinary prose per language.
SEED_CORPUS: dict[str, str] = {
    "en": (
        "The quick brown fox jumps over the lazy dog. "
        "This is a short example of English text written for training. "
        "The weather was cold and the children walked to the school. "
        "She said that the results of the experiment were very good. "
        "People often read books in the evening and drink tea with milk."
    ),
    "es": (
        "El rápido zorro marrón salta sobre el perro perezoso. "
        "Este es un ejemplo corto de texto en español escrito para entrenar. "
        "El tiempo era frío y los niños caminaban hacia la escuela. "
        "Ella dijo que los resultados del experimento fueron muy buenos. "
        "La gente suele leer libros por la noche y tomar té con leche."
    ),
    "fr": (
        "Le rapide renard brun saute par-dessus le chien paresseux. "
        "Ceci est un court exemple de texte français écrit pour l'entraînement. "
        "Le temps était froid et les enfants marchaient vers l'école. "
        "Elle a dit que les résultats de l'expérience étaient très bons. "
        "Les gens lisent souvent des livres le soir et boivent du thé au lait."
    ),
    "de": (
        "Der schnelle braune Fuchs springt über den faulen Hund. "
        "Dies ist ein kurzes Beispiel für deutschen Text zum Trainieren. "
        "Das Wetter war kalt und die Kinder gingen zur Schule. "
        "Sie sagte, dass die Ergebnisse des Experiments sehr gut waren. "
        "Die Leute lesen abends oft Bücher und trinken Tee mit Milch."
    ),
}

#: Profile size (top-K n-grams kept per profile).
PROFILE_TOP = 300


def _ngrams(text: str, max_n: int = 3) -> Counter:
    """Char n-grams (n = 1..max_n) of the lowercased text, words
    padded with '_' boundaries (the paper's formulation)."""
    counts: Counter[str] = Counter()
    for word in (text or "").lower().split():
        padded = f"_{word}_"
        for n in range(1, max_n + 1):
            for i in range(len(padded) - n + 1):
                counts[padded[i : i + n]] += 1
    return counts


def profile(text: str, top: int = PROFILE_TOP) -> list[str]:
    """Rank-ordered n-gram profile: most frequent first, ties broken
    lexicographically (deterministic)."""
    counts = _ngrams(text)
    return [
        g for g, _c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:top]


def _out_of_place(doc_profile: list[str], lang_rank: dict[str, int]) -> int:
    """Cavnar-Trenkle distance: sum over the doc profile of the rank
    displacement in the language profile; absent n-grams cost the
    maximum displacement."""
    max_cost = len(lang_rank) or 1
    return sum(
        abs(i - lang_rank[g]) if g in lang_rank else max_cost
        for i, g in enumerate(doc_profile)
    )


_MODEL: dict[str, dict[str, int]] | None = None


def model() -> dict[str, dict[str, int]]:
    """Per-language {ngram: rank} profiles, trained once per process
    from the embedded seed corpus (deterministic; cheap enough that a
    checked-in artifact would only add staleness risk)."""
    global _MODEL
    if _MODEL is None:
        _MODEL = {
            lang: {g: i for i, g in enumerate(profile(text))}
            for lang, text in SEED_CORPUS.items()
        }
    return _MODEL


def classify(text: str, default: str = "und") -> str:
    """Predict the language of ``text`` (ties and empty input →
    ``default`` / lexicographically first best language)."""
    doc = profile(text, top=PROFILE_TOP)
    if not doc:
        return default
    scores = {
        lang: _out_of_place(doc, rank) for lang, rank in model().items()
    }
    return min(scores.items(), key=lambda kv: (kv[1], kv[0]))[0]
