"""Fixed in-repo text samples for the character-trigram language-ID model.

The score tables in ``text.trigram_score_tables`` are derived
deterministically from ``TRAIN_SAMPLES`` at call time — no model file, no
RNG, same no-stored-model discipline as the md5-derandomized LSH planes:
any session (and the DuckDB oracle, via inlined literals) re-derives the
identical tables. ``HELDOUT_SAMPLES`` are disjoint sentences used only by
the accuracy test.

Composed for this repo; ordinary everyday prose in each language, chosen
to exercise the orthography (umlauts stripped to ASCII-adjacent forms are
NOT applied — normalize_text only lowercases and collapses whitespace, so
accented characters survive and are strong trigram features).
"""

from __future__ import annotations

TRAIN_SAMPLES: dict[str, str] = {
    "de": (
        "Der alte Mann ging langsam durch die enge Strasse und dachte an "
        "die vergangenen Jahre. Die Kinder spielten auf dem Platz vor der "
        "Schule, während die Mütter mit ihren schweren Taschen nach Hause "
        "gingen. Es ist nicht leicht, eine neue Sprache zu lernen, aber "
        "mit etwas Geduld und Übung wird es jeden Tag besser. Wir haben "
        "gestern einen langen Brief an unsere Freunde geschrieben und "
        "ihnen von der Reise erzählt. Das Wetter war in dieser Woche sehr "
        "schön, und viele Leute sind an den See gefahren. Ich möchte am "
        "Wochenende ein gutes Buch lesen und danach mit dem Hund im Wald "
        "spazieren gehen. Die Wissenschaftler haben eine wichtige "
        "Entdeckung gemacht, die unser Verständnis der Natur verändert."
    ),
    "en": (
        "The old man walked slowly down the narrow street and thought "
        "about the years that had passed. The children were playing in "
        "the square in front of the school while their mothers carried "
        "heavy bags home. It is not easy to learn a new language, but "
        "with some patience and practice it gets better every day. We "
        "wrote a long letter to our friends yesterday and told them "
        "about the journey. The weather has been very pleasant this "
        "week, and many people drove out to the lake. I would like to "
        "read a good book this weekend and then take the dog for a walk "
        "in the woods. The scientists have made an important discovery "
        "that changes our understanding of nature."
    ),
    "es": (
        "El hombre viejo caminaba despacio por la calle estrecha y "
        "pensaba en los años que habían pasado. Los niños jugaban en la "
        "plaza delante de la escuela mientras sus madres llevaban bolsas "
        "pesadas a casa. No es fácil aprender un idioma nuevo, pero con "
        "un poco de paciencia y práctica mejora cada día. Ayer "
        "escribimos una carta larga a nuestros amigos y les contamos el "
        "viaje. El tiempo ha sido muy agradable esta semana y mucha "
        "gente fue al lago. Me gustaría leer un buen libro este fin de "
        "semana y después pasear al perro por el bosque. Los científicos "
        "han hecho un descubrimiento importante que cambia nuestra "
        "comprensión de la naturaleza."
    ),
    "fr": (
        "Le vieil homme marchait lentement dans la rue étroite et "
        "pensait aux années qui avaient passé. Les enfants jouaient sur "
        "la place devant l'école pendant que leurs mères portaient de "
        "lourds sacs à la maison. Il n'est pas facile d'apprendre une "
        "nouvelle langue, mais avec un peu de patience et de pratique "
        "cela devient meilleur chaque jour. Hier, nous avons écrit une "
        "longue lettre à nos amis et nous leur avons raconté le voyage. "
        "Le temps a été très agréable cette semaine et beaucoup de gens "
        "sont allés au lac. Je voudrais lire un bon livre ce week-end et "
        "ensuite promener le chien dans la forêt. Les scientifiques ont "
        "fait une découverte importante qui change notre compréhension "
        "de la nature."
    ),
}

HELDOUT_SAMPLES: dict[str, list[str]] = {
    "de": [
        "Heute Morgen habe ich frisches Brot vom Markt geholt.",
        "Die Bibliothek öffnet erst um neun Uhr, also warten wir draussen.",
        "Mein Bruder arbeitet seit drei Jahren in einer kleinen Werkstatt.",
        "Können Sie mir bitte sagen, wie ich zum Bahnhof komme?",
        "Im Winter trinken wir gern heissen Tee mit Zitrone und Honig.",
        "Die Vorlesung über Geschichte war länger als erwartet.",
    ],
    "en": [
        "This morning I picked up fresh bread from the market.",
        "The library does not open until nine, so we wait outside.",
        "My brother has worked in a small workshop for three years.",
        "Could you please tell me how to get to the station?",
        "In winter we enjoy drinking hot tea with lemon and honey.",
        "The lecture about history ran longer than expected.",
    ],
    "es": [
        "Esta mañana compré pan fresco en el mercado.",
        "La biblioteca no abre hasta las nueve, así que esperamos fuera.",
        "Mi hermano trabaja desde hace tres años en un taller pequeño.",
        "¿Puede decirme por favor cómo llegar a la estación?",
        "En invierno nos gusta tomar té caliente con limón y miel.",
        "La conferencia sobre historia duró más de lo esperado.",
    ],
    "fr": [
        "Ce matin, j'ai acheté du pain frais au marché.",
        "La bibliothèque n'ouvre qu'à neuf heures, alors nous attendons dehors.",
        "Mon frère travaille depuis trois ans dans un petit atelier.",
        "Pouvez-vous me dire comment aller à la gare, s'il vous plaît ?",
        "En hiver, nous aimons boire du thé chaud avec du citron et du miel.",
        "La conférence sur l'histoire a duré plus longtemps que prévu.",
    ],
}
