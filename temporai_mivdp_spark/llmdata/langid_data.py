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

Coverage: 20 languages — Germanic (de, en, nl, sv, da), Romance (es, fr,
it, pt), Slavic Latin (pl, cs), Uralic (fi), Turkic (tr), plus seven
non-Latin-script languages (ru and uk Cyrillic — a confusable pair that
stress-tests the model beyond script detection — el Greek, ja CJK, ko
Hangul, ar Arabic, hi Devanagari) so the trigram model is exercised
across six scripts. Every language carries the SAME two
passages translated (training) and the same six disjoint sentences
(held-out), so per-language accuracy is comparable — and closely related
pairs (sv/da, es/pt/it, pl/cs) make the held-out gate a real test, not a
script detector. The samples contain no digits: the "no trigram matches"
edge case in tests stays stable as coverage grows. Extending further =
adding another TRAIN_SAMPLES / HELDOUT_SAMPLES pair; the score tables,
the Spark plan, and the DuckDB oracle all re-derive from the dict.
"""

from __future__ import annotations

#: Second training passage per language (city morning / meal / piano /
#: office / train / family themes — disjoint from the held-out
#: sentences' themes). Concatenated into TRAIN_SAMPLES below.
_TRAIN_2: dict[str, str] = {
    "de": (
        "Am frühen Morgen ist die Stadt still und die Luft ist kühl. "
        "Wir bereiten zusammen in der kleinen Küche ein einfaches Essen "
        "zu: Suppe, Reis, frisches Gemüse und ein wenig Fisch. Mein "
        "Nachbar spielt jeden Abend Klavier, und die Musik zieht über "
        "den Hof. Im Büro beantworten wir Briefe, bereiten Berichte vor "
        "und besprechen die Pläne für den kommenden Monat. Der Zug "
        "fährt am Mittag ab und überquert den breiten Fluss, die Felder "
        "und die niedrigen Hügel, bevor er die Küste erreicht. Am "
        "Sonntag versammelt sich die ganze Familie um den Tisch, und "
        "die Großeltern erzählen Geschichten aus ihrer Jugend."
    ),
    "en": (
        "In the early morning the city is quiet and the air is cool. "
        "We prepare a simple meal together in the small kitchen: soup, "
        "rice, fresh vegetables, and a little fish. My neighbour plays "
        "the piano every evening, and the music drifts across the "
        "courtyard. At the office we answer letters, prepare reports, "
        "and discuss the plans for the coming month. The train leaves "
        "at noon and crosses the wide river, the fields, and the low "
        "hills before it reaches the coast. On Sunday the whole family "
        "gathers around the table, and the grandparents tell stories "
        "from their youth."
    ),
    "es": (
        "Por la mañana temprano la ciudad está tranquila y el aire es "
        "fresco. Preparamos juntos una comida sencilla en la cocina "
        "pequeña: sopa, arroz, verduras frescas y un poco de pescado. "
        "Mi vecino toca el piano cada noche, y la música cruza el "
        "patio. En la oficina respondemos cartas, preparamos informes y "
        "discutimos los planes para el próximo mes. El tren sale al "
        "mediodía y cruza el río ancho, los campos y las colinas bajas "
        "antes de llegar a la costa. El domingo toda la familia se "
        "reúne alrededor de la mesa, y los abuelos cuentan historias de "
        "su juventud."
    ),
    "fr": (
        "Tôt le matin, la ville est calme et l'air est frais. Nous "
        "préparons ensemble un repas simple dans la petite cuisine : de "
        "la soupe, du riz, des légumes frais et un peu de poisson. Mon "
        "voisin joue du piano chaque soir, et la musique traverse la "
        "cour. Au bureau, nous répondons aux lettres, préparons des "
        "rapports et discutons des projets pour le mois prochain. Le "
        "train part à midi et traverse le large fleuve, les champs et "
        "les collines basses avant d'atteindre la côte. Le dimanche, "
        "toute la famille se réunit autour de la table, et les "
        "grands-parents racontent des histoires de leur jeunesse."
    ),
    "it": (
        "La mattina presto la città è tranquilla e l'aria è fresca. "
        "Prepariamo insieme un pasto semplice nella piccola cucina: "
        "zuppa, riso, verdure fresche e un po' di pesce. Il mio vicino "
        "suona il pianoforte ogni sera, e la musica attraversa il "
        "cortile. In ufficio rispondiamo alle lettere, prepariamo "
        "relazioni e discutiamo i piani per il prossimo mese. Il treno "
        "parte a mezzogiorno e attraversa il fiume largo, i campi e le "
        "colline basse prima di arrivare alla costa. La domenica tutta "
        "la famiglia si riunisce intorno al tavolo, e i nonni "
        "raccontano storie della loro giovinezza."
    ),
    "pt": (
        "De manhã cedo a cidade está tranquila e o ar está fresco. "
        "Preparamos juntos uma refeição simples na cozinha pequena: "
        "sopa, arroz, legumes frescos e um pouco de peixe. O meu "
        "vizinho toca piano todas as noites, e a música atravessa o "
        "pátio. No escritório respondemos às cartas, preparamos "
        "relatórios e discutimos os planos para o próximo mês. O "
        "comboio parte ao meio-dia e atravessa o rio largo, os campos "
        "e as colinas baixas antes de chegar à costa. No domingo toda "
        "a família se reúne à volta da mesa, e os avós contam "
        "histórias da sua juventude."
    ),
    "nl": (
        "In de vroege ochtend is de stad stil en de lucht is koel. Wij "
        "bereiden samen een eenvoudige maaltijd in de kleine keuken: "
        "soep, rijst, verse groenten en een beetje vis. Mijn buurman "
        "speelt elke avond piano, en de muziek drijft over de "
        "binnenplaats. Op kantoor beantwoorden wij brieven, maken "
        "verslagen en bespreken de plannen voor de komende maand. De "
        "trein vertrekt rond het middaguur en steekt de brede rivier, "
        "de velden en de lage heuvels over voordat hij de kust bereikt. "
        "Op zondag komt de hele familie rond de tafel samen, en de "
        "grootouders vertellen verhalen uit hun jeugd."
    ),
    "sv": (
        "Tidigt på morgonen är staden tyst och luften är sval. Vi lagar "
        "tillsammans en enkel måltid i det lilla köket: soppa, ris, "
        "färska grönsaker och lite fisk. Min granne spelar piano varje "
        "kväll, och musiken svävar över gården. På kontoret svarar vi "
        "på brev, förbereder rapporter och diskuterar planerna för den "
        "kommande månaden. Tåget avgår vid middagstid och korsar den "
        "breda floden, fälten och de låga kullarna innan det når "
        "kusten. På söndagen samlas hela familjen kring bordet, och "
        "farföräldrarna berättar historier från sin ungdom."
    ),
    "da": (
        "Tidligt om morgenen er byen stille, og luften er kølig. Vi "
        "laver sammen et enkelt måltid i det lille køkken: suppe, ris, "
        "friske grøntsager og lidt fisk. Min nabo spiller klaver hver "
        "aften, og musikken driver hen over gården. På kontoret "
        "besvarer vi breve, forbereder rapporter og drøfter planerne "
        "for den kommende måned. Toget kører ved middagstid og krydser "
        "den brede flod, markerne og de lave bakker, før det når "
        "kysten. Om søndagen samles hele familien omkring bordet, og "
        "bedsteforældrene fortæller historier fra deres ungdom."
    ),
    "fi": (
        "Varhain aamulla kaupunki on hiljainen ja ilma on viileä. "
        "Valmistamme yhdessä yksinkertaisen aterian pienessä "
        "keittiössä: keittoa, riisiä, tuoreita vihanneksia ja vähän "
        "kalaa. Naapurini soittaa pianoa joka ilta, ja musiikki leijuu "
        "pihan yli. Toimistossa vastaamme kirjeisiin, valmistelemme "
        "raportteja ja keskustelemme tulevan kuukauden suunnitelmista. "
        "Juna lähtee keskipäivällä ja ylittää leveän joen, pellot ja "
        "matalat kukkulat ennen kuin se saapuu rannikolle. Sunnuntaina "
        "koko perhe kokoontuu pöydän ääreen, ja isovanhemmat kertovat "
        "tarinoita nuoruudestaan."
    ),
    "pl": (
        "Wczesnym rankiem miasto jest ciche, a powietrze chłodne. "
        "Przygotowujemy razem prosty posiłek w małej kuchni: zupę, "
        "ryż, świeże warzywa i trochę ryby. Mój sąsiad gra na pianinie "
        "każdego wieczoru, a muzyka płynie przez podwórze. W biurze "
        "odpowiadamy na listy, przygotowujemy raporty i omawiamy plany "
        "na nadchodzący miesiąc. Pociąg odjeżdża w południe i "
        "przekracza szeroką rzekę, pola i niskie wzgórza, zanim dotrze "
        "do wybrzeża. W niedzielę cała rodzina zbiera się wokół stołu, "
        "a dziadkowie opowiadają historie ze swojej młodości."
    ),
    "cs": (
        "Brzy ráno je město tiché a vzduch je chladný. Připravujeme "
        "spolu jednoduché jídlo v malé kuchyni: polévku, rýži, čerstvou "
        "zeleninu a trochu ryby. Můj soused hraje každý večer na klavír "
        "a hudba se nese přes dvůr. V kanceláři odpovídáme na dopisy, "
        "připravujeme zprávy a probíráme plány na příští měsíc. Vlak "
        "odjíždí v poledne a překračuje širokou řeku, pole a nízké "
        "kopce, než dorazí k pobřeží. V neděli se celá rodina schází "
        "kolem stolu a prarodiče vyprávějí příběhy ze svého mládí."
    ),
    "tr": (
        "Sabahın erken saatlerinde şehir sessizdir ve hava serindir. "
        "Küçük mutfakta birlikte basit bir yemek hazırlarız: çorba, "
        "pilav, taze sebzeler ve biraz balık. Komşum her akşam piyano "
        "çalar ve müzik avlunun üzerinden süzülür. Ofiste mektuplara "
        "cevap verir, raporlar hazırlar ve gelecek ayın planlarını "
        "konuşuruz. Tren öğle vakti kalkar ve kıyıya varmadan önce "
        "geniş nehri, tarlaları ve alçak tepeleri geçer. Pazar günü "
        "bütün aile masanın etrafında toplanır ve büyükanne ile "
        "büyükbaba gençliklerinden hikayeler anlatır."
    ),
    "ru": (
        "Ранним утром город тихий, и воздух прохладный. Мы вместе "
        "готовим простую еду на маленькой кухне: суп, рис, свежие "
        "овощи и немного рыбы. Мой сосед каждый вечер играет на "
        "пианино, и музыка плывёт через двор. В офисе мы отвечаем на "
        "письма, готовим отчёты и обсуждаем планы на будущий месяц. "
        "Поезд отправляется в полдень и пересекает широкую реку, поля "
        "и низкие холмы, прежде чем добраться до побережья. В "
        "воскресенье вся семья собирается вокруг стола, и дедушка с "
        "бабушкой рассказывают истории из своей молодости."
    ),
    "el": (
        "νωρίς το πρωί η πόλη είναι ήσυχη και ο αέρας είναι δροσερός. "
        "ετοιμάζουμε μαζί ένα απλό γεύμα στη μικρή κουζίνα: σούπα, "
        "ρύζι, φρέσκα λαχανικά και λίγο ψάρι. ο γείτονάς μου παίζει "
        "πιάνο κάθε βράδυ, και η μουσική απλώνεται πάνω από την αυλή. "
        "στο γραφείο απαντάμε σε γράμματα, ετοιμάζουμε αναφορές και "
        "συζητάμε τα σχέδια για τον επόμενο μήνα. το τρένο φεύγει το "
        "μεσημέρι και περνά το πλατύ ποτάμι, τα χωράφια και τους "
        "χαμηλούς λόφους πριν φτάσει στην ακτή. την κυριακή όλη η "
        "οικογένεια μαζεύεται γύρω από το τραπέζι, και οι παππούδες "
        "λένε ιστορίες από τα νιάτα τους."
    ),
    "ja": (
        "早朝の町は静かで、空気は涼しい。わたしたちは小さな台所で一緒"
        "に簡単な食事を作る。汁物と米、新鮮な野菜、それに少しの魚。隣"
        "の人は毎晩ピアノを弾き、その音楽が中庭を越えて聞こえてくる。"
        "会社では手紙に返事を書き、報告書を用意し、来月の計画について"
        "話し合う。列車は昼に出発し、海岸に着く前に広い川と畑と低い丘"
        "を越えていく。日曜日には家族みんなが食卓のまわりに集まり、祖"
        "父母が若いころの話を聞かせてくれる。"
    ),
    "uk": (
        "Рано вранці місто тихе, а повітря прохолодне. Ми разом готуємо "
        "просту їжу на маленькій кухні: суп, рис, свіжі овочі та трохи "
        "риби. Мій сусід щовечора грає на піаніно, і музика лине через "
        "двір. В офісі ми відповідаємо на листи, готуємо звіти й "
        "обговорюємо плани на наступний місяць. Потяг відходить "
        "опівдні та перетинає широку річку, поля й низькі пагорби, "
        "перш ніж дістатися узбережжя. У неділю вся родина збирається "
        "за столом, і дідусь із бабусею розповідають історії зі своєї "
        "молодості."
    ),
    "ko": (
        "이른 아침 도시는 조용하고 공기는 서늘하다. 우리는 작은 부엌에서 "
        "함께 간단한 식사를 준비한다. 국과 밥과 신선한 채소와 약간의 "
        "생선이다. 이웃은 저녁마다 피아노를 치고, 음악이 마당을 건너 "
        "흐른다. 사무실에서 우리는 편지에 답하고 보고서를 준비하며 다음 "
        "달 계획을 의논한다. 기차는 정오에 출발해 넓은 강과 들판과 낮은 "
        "언덕을 지나 해안에 닿는다. 일요일에는 온 가족이 식탁에 모이고, "
        "조부모님은 젊은 시절 이야기를 들려준다."
    ),
    "ar": (
        "في الصباح الباكر تكون المدينة هادئة والهواء بارداً. نحضر معاً "
        "وجبة بسيطة في المطبخ الصغير: حساء وأرز وخضروات طازجة وقليل من "
        "السمك. يعزف جاري على البيانو كل مساء، وتعبر الموسيقى الفناء. "
        "في المكتب نرد على الرسائل ونعد التقارير ونناقش خطط الشهر "
        "القادم. يغادر القطار عند الظهر ويعبر النهر العريض والحقول "
        "والتلال المنخفضة قبل أن يصل إلى الساحل. يوم الأحد تجتمع "
        "العائلة كلها حول المائدة، ويروي الأجداد قصصاً من شبابهم."
    ),
    "hi": (
        "सुबह-सुबह शहर शांत रहता है और हवा ठंडी होती है। हम छोटी रसोई "
        "में मिलकर सादा खाना बनाते हैं: सूप, चावल, ताज़ी सब्ज़ियाँ और "
        "थोड़ी मछली। मेरा पड़ोसी हर शाम पियानो बजाता है, और संगीत आँगन "
        "के पार बहता है। दफ़्तर में हम चिट्ठियों का जवाब देते हैं, "
        "रिपोर्ट तैयार करते हैं और अगले महीने की योजनाओं पर चर्चा करते "
        "हैं। रेलगाड़ी दोपहर को छूटती है और चौड़ी नदी, खेतों और नीची "
        "पहाड़ियों को पार करके तट तक पहुँचती है। रविवार को पूरा परिवार "
        "मेज़ के चारों ओर इकट्ठा होता है, और दादा-दादी अपनी जवानी की "
        "कहानियाँ सुनाते हैं।"
    ),
}

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
    "it": (
        "Il vecchio camminava lentamente lungo la strada stretta e "
        "pensava agli anni passati. I bambini giocavano nella piazza "
        "davanti alla scuola mentre le loro madri portavano a casa borse "
        "pesanti. Non è facile imparare una lingua nuova, ma con un po' "
        "di pazienza e di pratica migliora ogni giorno. Ieri abbiamo "
        "scritto una lunga lettera ai nostri amici e abbiamo raccontato "
        "loro il viaggio. Il tempo è stato molto piacevole questa "
        "settimana e molta gente è andata al lago. Vorrei leggere un "
        "buon libro questo fine settimana e poi portare il cane a "
        "passeggio nel bosco. Gli scienziati hanno fatto una scoperta "
        "importante che cambia la nostra comprensione della natura."
    ),
    "pt": (
        "O velho caminhava devagar pela rua estreita e pensava nos anos "
        "que tinham passado. As crianças brincavam na praça em frente da "
        "escola enquanto as mães levavam sacolas pesadas para casa. Não "
        "é fácil aprender uma língua nova, mas com um pouco de paciência "
        "e prática melhora a cada dia. Ontem escrevemos uma carta longa "
        "aos nossos amigos e contámos a eles a viagem. O tempo esteve "
        "muito agradável esta semana e muita gente foi ao lago. Eu "
        "gostaria de ler um bom livro neste fim de semana e depois "
        "passear com o cachorro no bosque. Os cientistas fizeram uma "
        "descoberta importante que muda a nossa compreensão da natureza."
    ),
    "nl": (
        "De oude man liep langzaam door de smalle straat en dacht aan de "
        "jaren die voorbij waren. De kinderen speelden op het plein voor "
        "de school terwijl hun moeders met zware tassen naar huis "
        "gingen. Het is niet gemakkelijk om een nieuwe taal te leren, "
        "maar met wat geduld en oefening wordt het elke dag beter. "
        "Gisteren hebben wij een lange brief aan onze vrienden "
        "geschreven en hun over de reis verteld. Het weer was deze week "
        "erg aangenaam en veel mensen reden naar het meer. Ik wil dit "
        "weekend graag een goed boek lezen en daarna met de hond in het "
        "bos wandelen. De wetenschappers hebben een belangrijke "
        "ontdekking gedaan die ons begrip van de natuur verandert."
    ),
    "sv": (
        "Den gamle mannen gick långsamt längs den smala gatan och tänkte "
        "på åren som hade gått. Barnen lekte på torget framför skolan "
        "medan deras mödrar bar hem tunga kassar. Det är inte lätt att "
        "lära sig ett nytt språk, men med lite tålamod och övning blir "
        "det bättre varje dag. Igår skrev vi ett långt brev till våra "
        "vänner och berättade för dem om resan. Vädret har varit mycket "
        "behagligt denna vecka och många människor åkte ut till sjön. "
        "Jag skulle vilja läsa en bra bok i helgen och sedan ta en "
        "promenad med hunden i skogen. Forskarna har gjort en viktig "
        "upptäckt som förändrar vår förståelse av naturen."
    ),
    "da": (
        "Den gamle mand gik langsomt ned ad den smalle gade og tænkte på "
        "de år, der var gået. Børnene legede på pladsen foran skolen, "
        "mens deres mødre bar tunge tasker hjem. Det er ikke let at lære "
        "et nyt sprog, men med lidt tålmodighed og øvelse bliver det "
        "bedre hver dag. I går skrev vi et langt brev til vores venner "
        "og fortalte dem om rejsen. Vejret har været meget behageligt i "
        "denne uge, og mange mennesker kørte ud til søen. Jeg vil gerne "
        "læse en god bog i weekenden og bagefter gå en tur med hunden i "
        "skoven. Forskerne har gjort en vigtig opdagelse, som ændrer "
        "vores forståelse af naturen."
    ),
    "fi": (
        "Vanha mies käveli hitaasti kapeaa katua pitkin ja ajatteli "
        "menneitä vuosia. Lapset leikkivät aukiolla koulun edessä, kun "
        "äidit kantoivat raskaita kasseja kotiin. Uuden kielen "
        "oppiminen ei ole helppoa, mutta pienellä kärsivällisyydellä ja "
        "harjoituksella se paranee joka päivä. Eilen kirjoitimme pitkän "
        "kirjeen ystävillemme ja kerroimme heille matkasta. Sää on "
        "ollut tällä viikolla hyvin miellyttävä, ja monet ihmiset "
        "ajoivat järvelle. Haluaisin lukea hyvän kirjan viikonloppuna "
        "ja sen jälkeen kävellä koiran kanssa metsässä. Tutkijat ovat "
        "tehneet tärkeän löydön, joka muuttaa käsitystämme luonnosta."
    ),
    "pl": (
        "Stary człowiek szedł powoli wąską ulicą i myślał o latach, "
        "które minęły. Dzieci bawiły się na placu przed szkołą, podczas "
        "gdy ich matki niosły do domu ciężkie torby. Nauka nowego "
        "języka nie jest łatwa, ale z odrobiną cierpliwości i ćwiczeń z "
        "każdym dniem idzie lepiej. Wczoraj napisaliśmy długi list do "
        "naszych przyjaciół i opowiedzieliśmy im o podróży. Pogoda była "
        "w tym tygodniu bardzo przyjemna i wielu ludzi pojechało nad "
        "jezioro. Chciałbym przeczytać dobrą książkę w ten weekend, a "
        "potem pójść z psem na spacer do lasu. Naukowcy dokonali "
        "ważnego odkrycia, które zmienia nasze rozumienie przyrody."
    ),
    "cs": (
        "Starý muž šel pomalu úzkou ulicí a myslel na léta, která "
        "uplynula. Děti si hrály na náměstí před školou, zatímco jejich "
        "matky nesly domů těžké tašky. Naučit se nový jazyk není "
        "snadné, ale s trochou trpělivosti a cvičení se to každým dnem "
        "zlepšuje. Včera jsme napsali dlouhý dopis našim přátelům a "
        "vyprávěli jsme jim o cestě. Počasí bylo tento týden velmi "
        "příjemné a mnoho lidí jelo k jezeru. Rád bych si o víkendu "
        "přečetl dobrou knihu a potom šel se psem na procházku do lesa. "
        "Vědci učinili důležitý objev, který mění naše chápání přírody."
    ),
    "tr": (
        "Yaşlı adam dar sokakta yavaşça yürüyor ve geçen yılları "
        "düşünüyordu. Çocuklar okulun önündeki meydanda oynarken "
        "anneleri ağır çantaları eve taşıyordu. Yeni bir dil öğrenmek "
        "kolay değildir, ama biraz sabır ve alıştırma ile her gün daha "
        "iyi olur. Dün arkadaşlarımıza uzun bir mektup yazdık ve onlara "
        "yolculuğu anlattık. Bu hafta hava çok güzeldi ve birçok insan "
        "göle gitti. Bu hafta sonu iyi bir kitap okumak ve sonra "
        "köpekle ormanda yürüyüş yapmak istiyorum. Bilim insanları "
        "doğa anlayışımızı değiştiren önemli bir keşif yaptılar."
    ),
    "ru": (
        "Старый человек медленно шёл по узкой улице и думал о "
        "прошедших годах. Дети играли на площади перед школой, пока их "
        "матери несли домой тяжёлые сумки. Выучить новый язык нелегко, "
        "но с небольшим терпением и практикой становится лучше с "
        "каждым днём. Вчера мы написали длинное письмо нашим друзьям и "
        "рассказали им о поездке. Погода на этой неделе была очень "
        "приятной, и многие люди поехали на озеро. Я хотел бы "
        "прочитать хорошую книгу в выходные, а потом погулять с "
        "собакой в лесу. Учёные сделали важное открытие, которое "
        "меняет наше понимание природы."
    ),
    "el": (
        "ο γέρος περπατούσε αργά στον στενό δρόμο και σκεφτόταν τα "
        "χρόνια που είχαν περάσει. τα παιδιά έπαιζαν στην πλατεία "
        "μπροστά από το σχολείο ενώ οι μητέρες τους κουβαλούσαν βαριές "
        "τσάντες στο σπίτι. δεν είναι εύκολο να μάθει κανείς μια νέα "
        "γλώσσα, αλλά με λίγη υπομονή και εξάσκηση γίνεται καλύτερα "
        "κάθε μέρα. χθες γράψαμε ένα μακρύ γράμμα στους φίλους μας και "
        "τους διηγηθήκαμε το ταξίδι. ο καιρός ήταν πολύ ευχάριστος "
        "αυτή την εβδομάδα και πολλοί άνθρωποι πήγαν στη λίμνη. θα "
        "ήθελα να διαβάσω ένα καλό βιβλίο το σαββατοκύριακο και μετά "
        "να βγάλω βόλτα τον σκύλο στο δάσος. οι επιστήμονες έκαναν μια "
        "σημαντική ανακάλυψη που αλλάζει την κατανόησή μας για τη φύση."
    ),
    "ja": (
        "年老いた男は狭い通りをゆっくりと歩きながら、過ぎ去った年月の"
        "ことを考えていた。子どもたちは学校の前の広場で遊び、母親たち"
        "は重い荷物を持って家に帰っていった。新しい言語を学ぶのは簡単"
        "ではないが、少しの忍耐と練習で毎日少しずつ上達する。昨日、わ"
        "たしたちは友人に長い手紙を書き、旅の話を伝えた。今週は天気が"
        "とてもよく、多くの人が湖へ出かけた。週末にはよい本を読み、そ"
        "のあと犬と森を散歩したい。科学者たちは自然の理解を変える重要"
        "な発見をした。"
    ),
    "uk": (
        "Старий чоловік повільно йшов вузькою вулицею і думав про "
        "минулі роки. Діти гралися на площі перед школою, поки матері "
        "несли додому важкі сумки. Вивчати нову мову нелегко, але з "
        "терпінням і практикою щодня стає краще. Учора ми написали "
        "друзям довгого листа і розповіли їм про подорож. Цього тижня "
        "погода була дуже гарна, і багато людей поїхали до озера. На "
        "вихідних я хочу прочитати гарну книжку, а потім погуляти з "
        "собакою в лісі. Науковці зробили важливе відкриття, яке "
        "змінює наше розуміння природи."
    ),
    "ko": (
        "나이 든 남자는 좁은 거리를 천천히 걸으며 지나간 세월을 "
        "생각했다. 아이들은 학교 앞 광장에서 놀았고, 어머니들은 무거운 "
        "가방을 들고 집으로 돌아갔다. 새로운 언어를 배우는 것은 쉽지 "
        "않지만, 약간의 인내와 연습이 있으면 매일 조금씩 나아진다. "
        "어제 우리는 친구들에게 긴 편지를 써서 여행 이야기를 전했다. "
        "이번 주 날씨가 아주 좋아서 많은 사람들이 호수로 나갔다. "
        "주말에는 좋은 책을 읽고 나서 개와 함께 숲을 산책하고 싶다. "
        "과학자들은 자연에 대한 우리의 이해를 바꾸는 중요한 발견을 "
        "했다."
    ),
    "ar": (
        "كان الرجل العجوز يمشي ببطء في الشارع الضيق ويفكر في السنوات "
        "الماضية. كان الأطفال يلعبون في الساحة أمام المدرسة بينما كانت "
        "الأمهات يحملن الحقائب الثقيلة إلى البيت. ليس من السهل تعلم "
        "لغة جديدة، ولكن مع قليل من الصبر والتمرين يتحسن الأمر كل "
        "يوم. كتبنا أمس رسالة طويلة إلى أصدقائنا وحدثناهم عن الرحلة. "
        "كان الطقس جميلاً جداً هذا الأسبوع، وذهب كثير من الناس إلى "
        "البحيرة. أريد في نهاية الأسبوع أن أقرأ كتاباً جيداً ثم أتنزه "
        "مع الكلب في الغابة. توصل العلماء إلى اكتشاف مهم يغير فهمنا "
        "للطبيعة."
    ),
    "hi": (
        "बूढ़ा आदमी संकरी गली में धीरे-धीरे चलता हुआ बीते वर्षों के "
        "बारे में सोच रहा था। बच्चे स्कूल के सामने मैदान में खेल रहे "
        "थे, जबकि माताएँ भारी थैले लेकर घर जा रही थीं। नई भाषा सीखना "
        "आसान नहीं है, लेकिन थोड़े धैर्य और अभ्यास से यह हर दिन बेहतर "
        "होता जाता है। कल हमने अपने दोस्तों को एक लंबा पत्र लिखा और "
        "उन्हें यात्रा के बारे में बताया। इस सप्ताह मौसम बहुत सुहावना "
        "रहा, और बहुत से लोग झील की ओर गए। सप्ताहांत में मैं एक अच्छी "
        "किताब पढ़ना चाहता हूँ और फिर कुत्ते के साथ जंगल में टहलना "
        "चाहता हूँ। वैज्ञानिकों ने एक महत्वपूर्ण खोज की है जो प्रकृति "
        "के बारे में हमारी समझ बदल देती है।"
    ),
}

# concatenate the second passage into every language's training text
for _lang, _p2 in _TRAIN_2.items():
    TRAIN_SAMPLES[_lang] = TRAIN_SAMPLES[_lang] + " " + _p2
del _lang, _p2

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
    "it": [
        "Stamattina ho comprato del pane fresco al mercato.",
        "La biblioteca non apre prima delle nove, quindi aspettiamo fuori.",
        "Mio fratello lavora da tre anni in una piccola officina.",
        "Può dirmi per favore come arrivare alla stazione?",
        "In inverno ci piace bere tè caldo con limone e miele.",
        "La lezione di storia è durata più del previsto.",
    ],
    "pt": [
        "Esta manhã comprei pão fresco no mercado.",
        "A biblioteca só abre às nove, por isso esperamos lá fora.",
        "O meu irmão trabalha há três anos numa pequena oficina.",
        "Pode dizer-me por favor como chegar à estação?",
        "No inverno gostamos de beber chá quente com limão e mel.",
        "A palestra de história durou mais do que o esperado.",
    ],
    "nl": [
        "Vanmorgen heb ik vers brood op de markt gehaald.",
        "De bibliotheek gaat pas om negen uur open, dus wij wachten buiten.",
        "Mijn broer werkt al drie jaar in een kleine werkplaats.",
        "Kunt u mij vertellen hoe ik bij het station kom?",
        "In de winter drinken wij graag warme thee met citroen en honing.",
        "De lezing over geschiedenis duurde langer dan verwacht.",
    ],
    "sv": [
        "I morse hämtade jag färskt bröd på torget.",
        "Biblioteket öppnar inte förrän klockan nio, så vi väntar utanför.",
        "Min bror har arbetat i en liten verkstad i tre år.",
        "Kan du berätta för mig hur jag kommer till stationen?",
        "På vintern tycker vi om att dricka varmt te med citron och honung.",
        "Föreläsningen om historia blev längre än väntat.",
    ],
    "da": [
        "I morges hentede jeg friskt brød på markedet.",
        "Biblioteket åbner først klokken ni, så vi venter udenfor.",
        "Min bror har arbejdet i et lille værksted i tre år.",
        "Kan du fortælle mig, hvordan jeg kommer hen til stationen?",
        "Om vinteren kan vi godt lide at drikke varm te med citron og honning.",
        "Forelæsningen om historie varede længere end ventet.",
    ],
    "fi": [
        "Tänä aamuna hain tuoretta leipää torilta.",
        "Kirjasto avataan vasta yhdeksältä, joten odotamme ulkona.",
        "Veljeni on työskennellyt pienessä korjaamossa kolme vuotta.",
        "Voitteko kertoa minulle, miten pääsen asemalle?",
        "Talvella juomme mielellämme kuumaa teetä sitruunan ja hunajan kanssa.",
        "Historian luento kesti odotettua pidempään.",
    ],
    "pl": [
        "Dziś rano kupiłem świeży chleb na targu.",
        "Biblioteka otwiera się dopiero o dziewiątej, więc czekamy na zewnątrz.",
        "Mój brat od trzech lat pracuje w małym warsztacie.",
        "Czy może mi pan powiedzieć, jak dojść na dworzec?",
        "Zimą lubimy pić gorącą herbatę z cytryną i miodem.",
        "Wykład z historii trwał dłużej niż się spodziewaliśmy.",
    ],
    "cs": [
        "Dnes ráno jsem koupil čerstvý chléb na trhu.",
        "Knihovna otevírá až v devět, takže čekáme venku.",
        "Můj bratr pracuje už tři roky v malé dílně.",
        "Můžete mi prosím říct, jak se dostanu na nádraží?",
        "V zimě rádi pijeme horký čaj s citronem a medem.",
        "Přednáška o historii trvala déle, než jsme čekali.",
    ],
    "tr": [
        "Bu sabah pazardan taze ekmek aldım.",
        "Kütüphane dokuzdan önce açılmıyor, bu yüzden dışarıda bekliyoruz.",
        "Kardeşim üç yıldır küçük bir atölyede çalışıyor.",
        "Lütfen bana istasyona nasıl gideceğimi söyler misiniz?",
        "Kışın limonlu ve ballı sıcak çay içmeyi severiz.",
        "Tarih dersi beklenenden daha uzun sürdü.",
    ],
    "ru": [
        "Сегодня утром я купил свежий хлеб на рынке.",
        "Библиотека открывается только в девять, поэтому мы ждём снаружи.",
        "Мой брат уже три года работает в маленькой мастерской.",
        "Подскажите, пожалуйста, как пройти к вокзалу?",
        "Зимой мы любим пить горячий чай с лимоном и мёдом.",
        "Лекция по истории длилась дольше, чем ожидалось.",
    ],
    "el": [
        "σήμερα το πρωί αγόρασα φρέσκο ψωμί από την αγορά.",
        "η βιβλιοθήκη δεν ανοίγει πριν από τις εννέα, οπότε περιμένουμε έξω.",
        "ο αδερφός μου εργάζεται εδώ και τρία χρόνια σε ένα μικρό συνεργείο.",
        "μπορείτε να μου πείτε πώς θα φτάσω στον σταθμό;",
        "τον χειμώνα μας αρέσει να πίνουμε ζεστό τσάι με λεμόνι και μέλι.",
        "η διάλεξη για την ιστορία κράτησε περισσότερο από το αναμενόμενο.",
    ],
    "ja": [
        "けさ、市場で焼きたてのパンを買いました。",
        "図書館は九時にならないと開かないので、外で待っています。",
        "兄は三年前から小さな工房で働いています。",
        "駅までの行き方を教えていただけますか。",
        "冬にはレモンと蜂蜜を入れた熱いお茶を飲むのが好きです。",
        "歴史の講義は思ったより長くかかりました。",
    ],
    "uk": [
        "Сьогодні вранці я купив свіжий хліб на ринку.",
        "Бібліотека відчиняється лише о дев'ятій, тому ми чекаємо надворі.",
        "Мій брат уже три роки працює в маленькій майстерні.",
        "Підкажіть, будь ласка, як пройти до вокзалу?",
        "Узимку ми любимо пити гарячий чай з лимоном і медом.",
        "Лекція з історії тривала довше, ніж очікувалося.",
    ],
    "ko": [
        "오늘 아침 시장에서 갓 구운 빵을 샀습니다.",
        "도서관은 아홉 시가 되어야 열기 때문에 밖에서 기다립니다.",
        "제 동생은 삼 년째 작은 공방에서 일하고 있습니다.",
        "역까지 가는 길을 알려 주시겠습니까?",
        "겨울에는 레몬과 꿀을 넣은 뜨거운 차를 즐겨 마십니다.",
        "역사 강의는 예상보다 오래 걸렸습니다.",
    ],
    "ar": [
        "اشتريت هذا الصباح خبزاً طازجاً من السوق.",
        "لا تفتح المكتبة قبل التاسعة، لذلك ننتظر في الخارج.",
        "يعمل أخي منذ ثلاث سنوات في ورشة صغيرة.",
        "هل يمكنك أن تدلني على الطريق إلى المحطة؟",
        "في الشتاء نحب أن نشرب الشاي الساخن بالليمون والعسل.",
        "استغرقت محاضرة التاريخ وقتاً أطول مما كان متوقعاً.",
    ],
    "hi": [
        "आज सुबह मैंने बाज़ार से ताज़ा रोटी खरीदी।",
        "पुस्तकालय नौ बजे से पहले नहीं खुलता, इसलिए हम बाहर इंतज़ार करते हैं।",
        "मेरा भाई तीन साल से एक छोटी कार्यशाला में काम करता है।",
        "कृपया बताइए, स्टेशन तक कैसे पहुँचूँ?",
        "सर्दियों में हम नींबू और शहद वाली गरम चाय पीना पसंद करते हैं।",
        "इतिहास का व्याख्यान उम्मीद से लंबा चला।",
    ],
}
