package graft.operators

/** Character-trigram language-identification profiles — the n-gram
  * profile method of Cavnar & Trenkle, "N-Gram-Based Text
  * Categorization" (1994), in integer-exact form: a language's profile
  * is a literal table of its most characteristic code-point trigrams
  * (derived offline by differential frequency — count in the language
  * minus the max count in any other — over a multilingual sample of
  * everyday sentences), and a document scores 2 points per trigram hit
  * plus script points for code points in a language-distinctive
  * Unicode block (Cyrillic, Arabic, Hangul, kana, CJK ideographs).
  * Counts, not floats, so the argmax replays bit-for-bit in SQL.
  *
  * Code-point (not byte) trigrams: both Spark's `substring` and
  * DuckDB's list slicing operate on code points, so the same profile
  * literals drive both engines; UTF-8 byte slicing has no portable
  * SQL rendering. Non-Latin scripts are covered by their code points
  * directly plus the script-point backstop (exact-trigram matching is
  * sparse for ideographic text, where the trigram inventory is huge).
  *
  * Script weights: kana counts 3 and CJK 1 for Japanese vs CJK 2 for
  * Chinese, so kanji-heavy Japanese still reads as Japanese once kana
  * exceeds a quarter of the text, while pure-Han text reads as
  * Chinese; Hangul is unique to Korean (weight 3); Cyrillic/Arabic are
  * unique to Russian/Arabic here (weight 1, trigram profiles carry the
  * rest). Replaces the 4-language stopword argmax as the `doc_lang_id`
  * engine (reference: db/__init__.py has no language ID at all — this
  * is beyond-reference pipeline surface).
  */
object LangProfiles {

  val langs: Seq[String] = Seq("en", "de", "es", "fr", "it", "pt", "nl", "ru", "ar", "zh", "ja", "ko")

  /** Per-language characteristic trigrams, aligned with [[langs]]. */
  val profiles: Seq[Seq[String]] = Seq(
    /* en */ Seq(" th", "the", "he ", " of", "of ", "thi", "ry ", "t t", "d a", " an", "and", "his", "s o", "ld ", "d t", "ow ", "rea", " to", "ing", " wo", "s a", "wor", "ed ", "her", "ery", "ew ", "for", "ks ", "new", "now", "tha", "e w", "is ", "e b", "s t", " fo", "hat", "hou", "me ", " ar", " ev", " kn", " sh", "abo", "ad ", "any", "asu", "bec", "bee", "bou", "ead", "eas", "eop", "ey ", "f t", "g t", "gs ", "hav", "hey", "hin"),
    /* de */ Seq("die", "ie ", " zu", " di", "er ", "sch", " un", "und", "ich", "ung", "cht", "um ", " üb", "hen", "iel", "war", "ben", "der", "sen", "ch ", "das", "ein", "ies", "sie", "ter", "hab", "ht ", "im ", "lt ", "wis", "zu ", "übe", "nd ", "men", " wi", "e d", "che", "ber", "ern", "ese", "n l", "nsc", "rt ", "t u", "vie", "abe", "aus", "d s", "hte", "ler", "mme", "nge", "sse", " ei", " ka", " lä", "aft", "bei", "ehe", "ehr"),
    /* es */ Seq(" el", "el ", " la", " y ", "muc", "la ", "os ", " es", "a l", "los", "tie", "ció", "ión", "ón ", "n e", "uch", "l p", "bue", "ían", "do ", "ndo", "ier", "a t", "aba", "esp", "ido", "iem", "uen", "a y", "abr", "aci", "aña", "ba ", "cal", "ces", "ece", "hay", "ico", "lab", "las", "lec", "mañ", "muy", "n y", "nec", "noc", "nue", "pez", "ría", "sit", "ueb", "uev", "uy ", "y l", "ya ", "ñan", " en", "nte", "con", "por"),
    /* fr */ Seq("es ", " le", "nt ", "le ", "les", " de", "ns ", "us ", " tr", "s l", "t l", "ent", "on ", "t d", "ur ", "cou", "nou", "our", " ce", " et", " l'", "ait", "bea", "eau", "ire", "tou", "it ", "ous", " av", "ill", " ét", "au ", "oup", "ouv", "pou", "uco", "up ", "uve", "ais", "sur", " fa", "dan", "ons", "t b", "uis", "'il", "aie", "ans", "aut", "ble", "du ", "ec ", "iqu", "oir", "onn", "p d", "rès", "trè", "ute", "vai"),
    /* it */ Seq("to ", "per", "di ", "ti ", "re ", "zio", "ato", "gli", "i s", "mol", "olt", "tti", "a d", " mo", "are", "one", " gl", " pi", "i i", "li ", "no ", " pe", " st", "a s", "sto", "del", "ues", "att", " tu", " è ", "azi", "enz", "i a", "i p", "iat", "lto", "mo ", "nzi", "sce", "tut", "uol", "utt", "e s", "ion", " il", "ta ", "ell", "o s", "ro ", "amo", "ann", "ano", "era", "ero", "ett", "i d", "i h", "imp", "l m", "l t"),
    /* pt */ Seq(" o ", "mui", "ão ", " te", "uit", " as", "as ", "te ", "ste", "am ", "ito", "ra ", " a ", "pre", "tem", "o a", "ria", "eci", "o n", " os", " é ", "anh", "cis", "isa", "lha", "rec", "uma", "est", " pr", "ara", "o m", "ele", "ist", "o t", "com", "sco", "ela", "ess", "m a", "m m", " nã", "avr", "bom", "car", "coi", "hã ", "ira", "nho", "nhã", "nov", "não", "oas", "ou ", "pel", "ram", "rua", "so ", "soa", "stó", "tas"),
    /* nl */ Seq(" he", "en ", "het", "et ", "oor", "n h", "aar", "ze ", "ren", "ude", " om", "aan", "eel", "ete", "ij ", "ijn", "oud", "den", " we", "ten", " ve", " ze", "ken", "nie", " zi", "euw", "eze", "jn ", "naa", "rij", "vee", "zij", "at ", "n d", " ko", " ni", "n s", "ord", " ov", " va", "dat", "eer", "erk", "n o", "n v", "t z", "wer", "wet", " aa", " ee", " zo", "aal", "aat", "bij", "d g", "dez", "ege", "erg", "hap", "heb"),
    /* ru */ Seq(" пр", " и ", " на", "и п", "ка ", "мы ", " бы", " до", " мы", " он", " по", " сл", " ст", " эт", "а с", "был", "во ", "им ", "ли ", "ло ", "лов", "о у", "ово", "ом ", "про", "сло", "то ", "тро", "ыло", " бе", " бо", " в ", " за", " к ", " ко", " оп", " ра", " си", " ск", " со", " у ", " ул", " ут", " че", " чт", " яз", "а б", "а к", "а ч", "або", "ад ", "ает", "аза", "ака", "ако", "ала", "але", "али", "ас ", "ача"),
    /* ar */ Seq(" ال", "الك", " في", "في ", "لكل", "ي ا", " هذ", "ا ا", "الم", "انت", "ة ا", "ت ا", "ذا ", "كان", "كلم", "لمة", "لى ", "مة ", "نت ", "هذا", " إل", " إن", " اخ", " تح", " سي", " طو", " عل", " فو", " قا", " كا", " لن", " مع", " من", " نب", " نح", " نع", " وق", " وك", " وي", " يج", "آن ", "أتو", "إلى", "إنه", "اح ", "اخت", "ار ", "ارع", "الآ", "الب", "الت", "الذ", "الش", "الص", "الط", "الل", "ام ", "اول", "اية", "ب ي"),
    /* zh */ Seq(" 她说", " 我们", " 狗在", " 起初", " 这是", "上会来", "上工作", "上跑并", "与我们", "且跳过", "个项目", "了很长", "他们早", "们同在", "们在这", "们早上", "们正在", "会来到", "作了很", "初有道", "别系统", "到房子", "同在 ", "在构建", "在街上", "在这个", "大桌子", "她说他", "子这里", "工作了", "并且跳", "建的语", "很长时", "我们同", "我们在", "我们正", "房子这", "早上会", "时间 ", "是我们", "有道这", "来到房", "构建的", "桌子 ", "正在构", "测试 ", "狗在街", "的测试", "的语言", "目上工", "系统的", "统的测", "街上跑", "言识别", "识别系", "语言识", "说他们", "起初有", "跑并且", "跳过大"),
    /* ja */ Seq("私たち", "した ", "は私た", "ました", "ます ", " これ", " 初め", " 彼女", " 犬は", " 私た", "ありま", "あり言", "いまし", "います", "いる言", "い間こ", "えます", "があり", "が構築", "きなテ", "このプ", "これは", "してい", "たちが", "たちと", "たちは", "ちが構", "ちと共", "ちは長", "って大", "ている", "て大き", "でいま", "です ", "と共に", "と言い", "なテー", "にあり", "に取り", "に家に", "に来る", "に言葉", "のテス", "のプロ", "は朝に", "は通り", "は長い", "び越え", "めに言", "りまし", "りを走", "り組ん", "り言葉", "ると言", "る言語", "れは私", "を走っ", "を飛び", "んでい", "ェクト"),
    /* ko */ Seq(" 우리", " 말씀", " 있었", "고 말", "말씀이", "씀이 ", " 개가", " 거리", " 것이", " 그녀", " 그들", " 달리", " 뛰어", " 만들", " 말했", " 시스", " 식별", " 아침", " 언어", " 오랫", " 올 ", " 왔다", " 이 ", " 이것", " 있는", " 진행", " 집으", " 큰 ", " 태초", " 테스", " 테이", " 프로", " 함께", "가 거", "가 만", "개가 ", "거리를", "것은 ", "것이라", "고 있", "고 큰", "그녀는", "그들이", "께 있", "넘는다", "녀는 ", "는 그", "는 언", "는 오", "는다 ", "달리고", "동안 ", "들고 ", "들이 ", "뛰어넘", "라고 ", "랫동안", "로 올", "로젝트", "를 달"))

  /** Two held-out fixture sentences per language (never part of the
    * profile-derivation sample), aligned with [[langs]]. */
  val fixture: Seq[Seq[String]] = Seq(
    /* en */ Seq("it was the best of times and it was the worst of times",
      "all the people in the city know about the old stone bridge"),
    /* de */ Seq("es war die beste zeit und es war die schlechteste zeit",
      "alle menschen in der stadt kennen die alte steinerne brücke"),
    /* es */ Seq("era el mejor de los tiempos y era el peor de los tiempos",
      "toda la gente de la ciudad conoce el viejo puente de piedra"),
    /* fr */ Seq("c'était le meilleur des temps et c'était le pire des temps",
      "tous les gens de la ville connaissent le vieux pont de pierre"),
    /* it */ Seq("era il migliore dei tempi ed era il peggiore dei tempi",
      "tutta la gente della città conosce il vecchio ponte di pietra"),
    /* pt */ Seq("era o melhor dos tempos e era o pior dos tempos",
      "todas as pessoas da cidade conhecem a velha ponte de pedra"),
    /* nl */ Seq("het was de beste tijd en het was de slechtste tijd",
      "alle mensen in de stad kennen de oude stenen brug"),
    /* ru */ Seq("это было лучшее время и это было худшее время",
      "все люди в городе знают старый каменный мост"),
    /* ar */ Seq("كان أفضل الأوقات وكان أسوأ الأوقات",
      "كل الناس في المدينة يعرفون الجسر الحجري القديم"),
    /* zh */ Seq("这是最好的时代也是最坏的时代",
      "城里所有的人都知道那座古老的石桥"),
    /* ja */ Seq("それは最高の時代でありまた最悪の時代でもありました",
      "町のすべての人々はその古い石橋を知っています"),
    /* ko */ Seq("최고의 시절이었고 또한 최악의 시절이었다",
      "도시의 모든 사람들은 그 오래된 돌다리를 알고 있다"))

  /** Unicode script blocks per language: (weight, lo, hi) code-point
    * ranges, additive integer points per character in range. */
  val scriptRanges: Map[String, Seq[(Int, Int, Int)]] = Map(
    "ru" -> Seq((1, 0x0400, 0x04FF)),
    "ar" -> Seq((1, 0x0600, 0x06FF)),
    "ko" -> Seq((3, 0xAC00, 0xD7AF), (3, 0x1100, 0x11FF)),
    "ja" -> Seq((3, 0x3040, 0x30FF), (1, 0x4E00, 0x9FFF)),
    "zh" -> Seq((2, 0x4E00, 0x9FFF)))
}
