#!/usr/bin/env python
"""Deterministic multilingual fixture for the trained language-ID
path (``lang_id_ngram``): tests/fixtures/lang/lang_docs.tsv with
(doc_id, lang, text) rows in en/de/fr/es/zh.

Regenerate with  python scripts/gen_lang_fixtures.py  — byte-stable
(seeded PRNG, fixed pools).  Design:

- 70% of the Latin-script docs mix FUNCTION words (the heuristic
  ``lang_id`` marker lexicons can catch these) with content words;
- 30% are CONTENT-ONLY ("marker-free"): no stopwords at all, so the
  stopword-hit heuristic returns 'und' and the char-n-gram NB must
  carry them on orthography alone (ß/accents/suffix morphology).
  This is the committed accuracy gap the upgrade is measured on
  (tests/test_textstats.py::test_lang_ngram_beats_heuristic).
- zh docs are hanzi strings (both paths detect CJK trivially; kept
  for the multiclass shape).

Plain ASCII TSV except the UTF-8 accented/CJK letters; no tabs,
quotes, or empty fields (same engine-parity discipline as
gen_gdelt_fixtures.py).
"""

from __future__ import annotations

import os
import random

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "lang")

N_DOCS = 500
WORDS_PER_DOC = 22

FUNCTION_WORDS = {
    "en": "the and is to in of that it for on with as was at by this have "
          "from or had not are but they you we all were which their".split(),
    "de": "der die das und ist nicht ich sie wir ihr ein eine mit von auf "
          "für dem den als auch nach bei aus wenn über aber noch wie".split(),
    "fr": "le la les et est dans une des que pour qui sur pas avec vous "
          "nous ils elle son ses mais comme tout fait être avoir plus".split(),
    "es": "el los las y es en una que por para con como pero sus más este "
          "esta son fue entre cuando hasta desde donde muy sin sobre".split(),
}

CONTENT_WORDS = {
    "en": "house water morning children government window question history "
          "development work city street newspaper science knowledge "
          "building thought language business weather".split(),
    "de": "haus wasser morgen kinder regierung fenster frage geschichte "
          "entwicklung arbeit stadt straße zeitung wissenschaft möglichkeit "
          "gebäude gedanke sprache geschäft wetter".split(),
    "fr": "maison eau matin enfants gouvernement fenêtre question histoire "
          "développement travail ville journal science connaissance "
          "bâtiment pensée langue entreprise température".split(),
    "es": "casa agua mañana niños gobierno ventana pregunta historia "
          "desarrollo trabajo ciudad periódico ciencia conocimiento "
          "edificio pensamiento lengua empresa también".split(),
}

HANZI = (
    "的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得"
    "就那要下以生会自着去之过家学对可她里后小么心多天而能好都然没日"
    "于起还发成事只作当想看文无开手十用主行方又如前所本见经头面公同"
)

LANGS = ["en", "de", "fr", "es", "zh"]


def make_doc(rng: random.Random, lang: str, marker_free: bool) -> str:
    if lang == "zh":
        return " ".join(
            "".join(rng.choice(HANZI) for _ in range(rng.randint(3, 6)))
            for _ in range(8)
        )
    content = CONTENT_WORDS[lang]
    if marker_free:
        pool = content
    else:
        pool = content + FUNCTION_WORDS[lang] * 2  # function words frequent
    return " ".join(rng.choice(pool) for _ in range(WORDS_PER_DOC))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = random.Random(20260815)
    path = os.path.join(OUT, "lang_docs.tsv")
    with open(path, "w", encoding="utf-8", newline="\n") as f:
        for i in range(N_DOCS):
            lang = LANGS[i % len(LANGS)]
            marker_free = lang != "zh" and i % 10 in (1, 4, 7)  # 30%
            text = make_doc(rng, lang, marker_free)
            assert "\t" not in text and '"' not in text and text
            f.write(f"{i}\t{lang}\t{text}\n")
    print(f"{path}: {N_DOCS} rows")


if __name__ == "__main__":
    main()
