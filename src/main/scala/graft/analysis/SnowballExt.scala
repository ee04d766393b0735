package graft.analysis

/** Snowball stemmers for Armenian, Basque, Catalan and Irish — the four
  * remaining members of the reference's 23-algorithm Tartarus set
  * (Tartarus/Snowball/Ext/{Armenian,Basque,Catalan,Irish}Stemmer.cs;
  * published snowballstem.org definitions). Unlike the 19 stemmers in
  * Snowball.scala, the reference test archive ships NO voc/output vectors
  * for these four, so SnowballExtSpec validates hand-traced cases against
  * the published step semantics instead (plus structural invariants).
  *
  * Restated like the rest of the family: per-step functions over strings,
  * longest-suffix "among" matching with post-selection region conditions
  * (condition failure fails the step, no shorter-entry fallback — the
  * generated code's switch-after-FindAmongB semantics), deletions
  * destructive. Two control-flow shapes faithfully carried over:
  *   - Basque's `repeat` loops thread a VIRTUAL END through successive
  *     matches (backward slices leave the cursor before the replacement,
  *     so later matches in the same pass never re-examine replaced text);
  *   - Armenian limits all backward matching to the region after the
  *     first vowel (setlimit tomark pV), while Irish/Catalan match
  *     unrestricted and gate only on R1/R2/RV marks.
  */
private[analysis] object SnowballExtTables {
  // ==== Armenian tables ====
  val armenian_a0: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("\u0580\u0578\u0580\u0564", 1), ("\u0565\u0580\u0578\u0580\u0564", 1), ("\u0561\u056c\u056b", 1), ("\u0561\u056f\u056b", 1), ("\u0578\u0580\u0561\u056f", 1), ("\u0565\u0572", 1), ("\u0561\u056f\u0561\u0576", 1), ("\u0561\u0580\u0561\u0576", 1), ("\u0565\u0576", 1), ("\u0565\u056f\u0565\u0576", 1), ("\u0565\u0580\u0565\u0576", 1), ("\u0578\u0580\u0567\u0576", 1), ("\u056b\u0576", 1), ("\u0563\u056b\u0576", 1), ("\u0578\u057e\u056b\u0576", 1), ("\u056c\u0561\u0575\u0576", 1), ("\u057e\u0578\u0582\u0576", 1), ("\u057a\u0565\u057d", 1), ("\u056b\u057e", 1), ("\u0561\u057f", 1), ("\u0561\u057e\u0565\u057f", 1), ("\u056f\u0578\u057f", 1), ("\u0562\u0561\u0580", 1)))
  val armenian_a1: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("\u0561", 1), ("\u0561\u0581\u0561", 1), ("\u0565\u0581\u0561", 1), ("\u057e\u0565", 1), ("\u0561\u0581\u0580\u056b", 1), ("\u0561\u0581\u056b", 1), ("\u0565\u0581\u056b", 1), ("\u057e\u0565\u0581\u056b", 1), ("\u0561\u056c", 1), ("\u0568\u0561\u056c", 1), ("\u0561\u0576\u0561\u056c", 1), ("\u0565\u0576\u0561\u056c", 1), ("\u0561\u0581\u0576\u0561\u056c", 1), ("\u0565\u056c", 1), ("\u0568\u0565\u056c", 1), ("\u0576\u0565\u056c", 1), ("\u0581\u0576\u0565\u056c", 1), ("\u0565\u0581\u0576\u0565\u056c", 1), ("\u0579\u0565\u056c", 1), ("\u057e\u0565\u056c", 1), ("\u0561\u0581\u057e\u0565\u056c", 1), ("\u0565\u0581\u057e\u0565\u056c", 1), ("\u057f\u0565\u056c", 1), ("\u0561\u057f\u0565\u056c", 1), ("\u0578\u057f\u0565\u056c", 1), ("\u056f\u0578\u057f\u0565\u056c", 1), ("\u057e\u0561\u056e", 1), ("\u0578\u0582\u0574", 1), ("\u057e\u0578\u0582\u0574", 1), ("\u0561\u0576", 1), ("\u0581\u0561\u0576", 1), ("\u0561\u0581\u0561\u0576", 1), ("\u0561\u0581\u0580\u056b\u0576", 1), ("\u0561\u0581\u056b\u0576", 1), ("\u0565\u0581\u056b\u0576", 1), ("\u057e\u0565\u0581\u056b\u0576", 1), ("\u0561\u056c\u056b\u057d", 1), ("\u0565\u056c\u056b\u057d", 1), ("\u0561\u057e", 1), ("\u0561\u0581\u0561\u057e", 1), ("\u0565\u0581\u0561\u057e", 1), ("\u0561\u056c\u0578\u057e", 1), ("\u0565\u056c\u0578\u057e", 1), ("\u0561\u0580", 1), ("\u0561\u0581\u0561\u0580", 1), ("\u0565\u0581\u0561\u0580", 1), ("\u0561\u0581\u0580\u056b\u0580", 1), ("\u0561\u0581\u056b\u0580", 1), ("\u0565\u0581\u056b\u0580", 1), ("\u057e\u0565\u0581\u056b\u0580", 1), ("\u0561\u0581", 1), ("\u0565\u0581", 1), ("\u0561\u0581\u0580\u0565\u0581", 1), ("\u0561\u056c\u0578\u0582\u0581", 1), ("\u0565\u056c\u0578\u0582\u0581", 1), ("\u0561\u056c\u0578\u0582", 1), ("\u0565\u056c\u0578\u0582", 1), ("\u0561\u0584", 1), ("\u0581\u0561\u0584", 1), ("\u0561\u0581\u0561\u0584", 1), ("\u0561\u0581\u0580\u056b\u0584", 1), ("\u0561\u0581\u056b\u0584", 1), ("\u0565\u0581\u056b\u0584", 1), ("\u057e\u0565\u0581\u056b\u0584", 1), ("\u0561\u0576\u0584", 1), ("\u0581\u0561\u0576\u0584", 1), ("\u0561\u0581\u0561\u0576\u0584", 1), ("\u0561\u0581\u0580\u056b\u0576\u0584", 1), ("\u0561\u0581\u056b\u0576\u0584", 1), ("\u0565\u0581\u056b\u0576\u0584", 1), ("\u057e\u0565\u0581\u056b\u0576\u0584", 1)))
  val armenian_a2: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("\u0578\u0580\u0564", 1), ("\u0578\u0582\u0575\u0569", 1), ("\u0578\u0582\u0570\u056b", 1), ("\u0581\u056b", 1), ("\u056b\u056c", 1), ("\u0561\u056f", 1), ("\u0575\u0561\u056f", 1), ("\u0561\u0576\u0561\u056f", 1), ("\u056b\u056f", 1), ("\u0578\u0582\u056f", 1), ("\u0561\u0576", 1), ("\u057a\u0561\u0576", 1), ("\u057d\u057f\u0561\u0576", 1), ("\u0561\u0580\u0561\u0576", 1), ("\u0565\u0572\u0567\u0576", 1), ("\u0575\u0578\u0582\u0576", 1), ("\u0578\u0582\u0569\u0575\u0578\u0582\u0576", 1), ("\u0561\u056e\u0578", 1), ("\u056b\u0579", 1), ("\u0578\u0582\u057d", 1), ("\u0578\u0582\u057d\u057f", 1), ("\u0563\u0561\u0580", 1), ("\u057e\u0578\u0580", 1), ("\u0561\u057e\u0578\u0580", 1), ("\u0578\u0581", 1), ("\u0561\u0576\u0585\u0581", 1), ("\u0578\u0582", 1), ("\u0584", 1), ("\u0579\u0565\u0584", 1), ("\u056b\u0584", 1), ("\u0561\u056c\u056b\u0584", 1), ("\u0561\u0576\u056b\u0584", 1), ("\u057e\u0561\u056e\u0584", 1), ("\u0578\u0582\u0575\u0584", 1), ("\u0565\u0576\u0584", 1), ("\u0578\u0576\u0584", 1), ("\u0578\u0582\u0576\u0584", 1), ("\u0574\u0578\u0582\u0576\u0584", 1), ("\u056b\u0579\u0584", 1), ("\u0561\u0580\u0584", 1)))
  val armenian_a3: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("\u057d\u0561", 1), ("\u057e\u0561", 1), ("\u0561\u0574\u0562", 1), ("\u0564", 1), ("\u0561\u0576\u0564", 1), ("\u0578\u0582\u0569\u0575\u0561\u0576\u0564", 1), ("\u057e\u0561\u0576\u0564", 1), ("\u0578\u057b\u0564", 1), ("\u0565\u0580\u0564", 1), ("\u0576\u0565\u0580\u0564", 1), ("\u0578\u0582\u0564", 1), ("\u0568", 1), ("\u0561\u0576\u0568", 1), ("\u0578\u0582\u0569\u0575\u0561\u0576\u0568", 1), ("\u057e\u0561\u0576\u0568", 1), ("\u0578\u057b\u0568", 1), ("\u0565\u0580\u0568", 1), ("\u0576\u0565\u0580\u0568", 1), ("\u056b", 1), ("\u057e\u056b", 1), ("\u0565\u0580\u056b", 1), ("\u0576\u0565\u0580\u056b", 1), ("\u0561\u0576\u0578\u0582\u0574", 1), ("\u0565\u0580\u0578\u0582\u0574", 1), ("\u0576\u0565\u0580\u0578\u0582\u0574", 1), ("\u0576", 1), ("\u0561\u0576", 1), ("\u0578\u0582\u0569\u0575\u0561\u0576", 1), ("\u057e\u0561\u0576", 1), ("\u056b\u0576", 1), ("\u0565\u0580\u056b\u0576", 1), ("\u0576\u0565\u0580\u056b\u0576", 1), ("\u0578\u0582\u0569\u0575\u0561\u0576\u0576", 1), ("\u0565\u0580\u0576", 1), ("\u0576\u0565\u0580\u0576", 1), ("\u0578\u0582\u0576", 1), ("\u0578\u057b", 1), ("\u0578\u0582\u0569\u0575\u0561\u0576\u057d", 1), ("\u057e\u0561\u0576\u057d", 1), ("\u0578\u057b\u057d", 1), ("\u0578\u057e", 1), ("\u0561\u0576\u0578\u057e", 1), ("\u057e\u0578\u057e", 1), ("\u0565\u0580\u0578\u057e", 1), ("\u0576\u0565\u0580\u0578\u057e", 1), ("\u0565\u0580", 1), ("\u0576\u0565\u0580", 1), ("\u0581", 1), ("\u056b\u0581", 1), ("\u057e\u0561\u0576\u056b\u0581", 1), ("\u0578\u057b\u056b\u0581", 1), ("\u057e\u056b\u0581", 1), ("\u0565\u0580\u056b\u0581", 1), ("\u0576\u0565\u0580\u056b\u0581", 1), ("\u0581\u056b\u0581", 1), ("\u0578\u0581", 1), ("\u0578\u0582\u0581", 1)))

  // ==== Basque tables ====
  val basque_a0: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("idea", 1), ("bidea", 1), ("kidea", 1), ("pidea", 1), ("kundea", 1), ("galea", 1), ("tailea", 1), ("tzailea", 1), ("gunea", 1), ("kunea", 1), ("tzaga", 1), ("gaia", 1), ("aldia", 1), ("taldia", 1), ("karia", 1), ("garria", 2), ("karria", 1), ("ka", 1), ("tzaka", 1), ("la", 1), ("mena", 1), ("pena", 1), ("kina", 1), ("ezina", 1), ("tezina", 1), ("kuna", 1), ("tuna", 1), ("kizuna", 1), ("era", 1), ("bera", 1), ("arabera", 4), ("kera", 1), ("pera", 1), ("orra", 1), ("korra", 1), ("dura", 1), ("gura", 1), ("kura", 1), ("tura", 1), ("eta", 1), ("keta", 1), ("gailua", 1), ("eza", 1), ("erreza", 1), ("tza", 2), ("gaitza", 1), ("kaitza", 1), ("kuntza", 1), ("ide", 1), ("bide", 1), ("kide", 1), ("pide", 1), ("kunde", 1), ("tzake", 1), ("tzeke", 1), ("le", 1), ("gale", 1), ("taile", 1), ("tzaile", 1), ("gune", 1), ("kune", 1), ("tze", 1), ("atze", 1), ("gai", 1), ("aldi", 1), ("taldi", 1), ("ki", 1), ("ari", 1), ("kari", 1), ("lari", 1), ("tari", 1), ("etari", 1), ("garri", 2), ("karri", 1), ("arazi", 1), ("tarazi", 1), ("an", 1), ("ean", 1), ("rean", 1), ("kan", 1), ("etan", 1), ("atseden", 3), ("men", 1), ("pen", 1), ("kin", 1), ("rekin", 1), ("ezin", 1), ("tezin", 1), ("tun", 1), ("kizun", 1), ("go", 1), ("ago", 1), ("tio", 1), ("dako", 1), ("or", 1), ("kor", 1), ("tzat", 1), ("du", 1), ("gailu", 1), ("tu", 1), ("atu", 1), ("aldatu", 1), ("tatu", 1), ("baditu", 5), ("ez", 1), ("errez", 1), ("tzez", 1), ("gaitz", 1), ("kaitz", 1)))
  val basque_a1: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("ada", 1), ("kada", 1), ("anda", 1), ("denda", 1), ("gabea", 1), ("kabea", 1), ("aldea", 1), ("kaldea", 1), ("taldea", 1), ("ordea", 1), ("zalea", 1), ("tzalea", 1), ("gilea", 1), ("emea", 1), ("kumea", 1), ("nea", 1), ("enea", 1), ("zionea", 1), ("unea", 1), ("gunea", 1), ("pea", 1), ("aurrea", 1), ("tea", 1), ("kotea", 1), ("artea", 1), ("ostea", 1), ("etxea", 1), ("ga", 1), ("anga", 1), ("gaia", 1), ("aldia", 1), ("taldia", 1), ("handia", 1), ("mendia", 1), ("geia", 1), ("egia", 1), ("degia", 1), ("tegia", 1), ("nahia", 1), ("ohia", 1), ("kia", 1), ("tokia", 1), ("oia", 1), ("koia", 1), ("aria", 1), ("karia", 1), ("laria", 1), ("taria", 1), ("eria", 1), ("keria", 1), ("teria", 1), ("garria", 2), ("larria", 1), ("kirria", 1), ("duria", 1), ("asia", 1), ("tia", 1), ("ezia", 1), ("bizia", 1), ("ontzia", 1), ("ka", 1), ("joka", 3), ("aurka", 10), ("ska", 1), ("xka", 1), ("zka", 1), ("gibela", 1), ("gela", 1), ("kaila", 1), ("skila", 1), ("tila", 1), ("ola", 1), ("na", 1), ("kana", 1), ("ena", 1), ("garrena", 1), ("gerrena", 1), ("urrena", 1), ("zaina", 1), ("tzaina", 1), ("kina", 1), ("mina", 1), ("garna", 1), ("una", 1), ("duna", 1), ("asuna", 1), ("tasuna", 1), ("ondoa", 1), ("kondoa", 1), ("ngoa", 1), ("zioa", 1), ("koa", 1), ("takoa", 1), ("zkoa", 1), ("noa", 1), ("zinoa", 1), ("aroa", 1), ("taroa", 1), ("zaroa", 1), ("eroa", 1), ("oroa", 1), ("osoa", 1), ("toa", 1), ("ttoa", 1), ("ztoa", 1), ("txoa", 1), ("tzoa", 1), ("\u00f1oa", 1), ("ra", 1), ("ara", 1), ("dara", 1), ("liara", 1), ("tiara", 1), ("tara", 1), ("etara", 1), ("tzara", 1), ("bera", 1), ("kera", 1), ("pera", 1), ("ora", 2), ("tzarra", 1), ("korra", 1), ("tra", 1), ("sa", 1), ("osa", 1), ("ta", 1), ("eta", 1), ("keta", 1), ("sta", 1), ("dua", 1), ("mendua", 1), ("ordua", 1), ("lekua", 1), ("burua", 1), ("durua", 1), ("tsua", 1), ("tua", 1), ("mentua", 1), ("estua", 1), ("txua", 1), ("zua", 1), ("tzua", 1), ("za", 1), ("eza", 1), ("eroza", 1), ("tza", 2), ("koitza", 1), ("antza", 1), ("gintza", 1), ("kintza", 1), ("kuntza", 1), ("gabe", 1), ("kabe", 1), ("kide", 1), ("alde", 1), ("kalde", 1), ("talde", 1), ("orde", 1), ("ge", 1), ("zale", 1), ("tzale", 1), ("gile", 1), ("eme", 1), ("kume", 1), ("ne", 1), ("zione", 1), ("une", 1), ("gune", 1), ("pe", 1), ("aurre", 1), ("te", 1), ("kote", 1), ("arte", 1), ("oste", 1), ("etxe", 1), ("gai", 1), ("di", 1), ("aldi", 1), ("taldi", 1), ("geldi", 8), ("handi", 1), ("mendi", 1), ("gei", 1), ("egi", 1), ("degi", 1), ("tegi", 1), ("nahi", 1), ("ohi", 1), ("ki", 1), ("toki", 1), ("oi", 1), ("goi", 1), ("koi", 1), ("ari", 1), ("kari", 1), ("lari", 1), ("tari", 1), ("garri", 2), ("larri", 1), ("kirri", 1), ("duri", 1), ("asi", 1), ("ti", 1), ("ontzi", 1), ("\u00f1i", 1), ("ak", 1), ("ek", 1), ("tarik", 1), ("gibel", 1), ("ail", 1), ("kail", 1), ("kan", 1), ("tan", 1), ("etan", 1), ("en", 4), ("ren", 2), ("garren", 1), ("gerren", 1), ("urren", 1), ("ten", 4), ("tzen", 4), ("zain", 1), ("tzain", 1), ("kin", 1), ("min", 1), ("dun", 1), ("asun", 1), ("tasun", 1), ("aizun", 1), ("ondo", 1), ("kondo", 1), ("go", 1), ("ngo", 1), ("zio", 1), ("ko", 1), ("trako", 5), ("tako", 1), ("etako", 1), ("eko", 1), ("tariko", 1), ("sko", 1), ("tuko", 1), ("minutuko", 6), ("zko", 1), ("no", 1), ("zino", 1), ("ro", 1), ("aro", 1), ("igaro", 9), ("taro", 1), ("zaro", 1), ("ero", 1), ("giro", 1), ("oro", 1), ("oso", 1), ("to", 1), ("tto", 1), ("zto", 1), ("txo", 1), ("tzo", 1), ("gintzo", 1), ("\u00f1o", 1), ("zp", 1), ("ar", 1), ("dar", 1), ("behar", 1), ("zehar", 7), ("liar", 1), ("tiar", 1), ("tar", 1), ("tzar", 1), ("or", 2), ("kor", 1), ("os", 1), ("ket", 1), ("du", 1), ("mendu", 1), ("ordu", 1), ("leku", 1), ("buru", 2), ("duru", 1), ("tsu", 1), ("tu", 1), ("tatu", 4), ("mentu", 1), ("estu", 1), ("txu", 1), ("zu", 1), ("tzu", 1), ("gintzu", 1), ("z", 1), ("ez", 1), ("eroz", 1), ("tz", 1), ("koitz", 1)))
  val basque_a2: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("zlea", 2), ("keria", 1), ("la", 1), ("era", 1), ("dade", 1), ("tade", 1), ("date", 1), ("tate", 1), ("gi", 1), ("ki", 1), ("ik", 1), ("lanik", 1), ("rik", 1), ("larik", 1), ("ztik", 1), ("go", 1), ("ro", 1), ("ero", 1), ("to", 1)))

  // ==== Catalan tables ====
  val catalan_a0: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("", 13), ("\u00b7", 12), ("\u00e0", 2), ("\u00e1", 1), ("\u00e8", 4), ("\u00e9", 3), ("\u00ec", 6), ("\u00ed", 5), ("\u00ef", 11), ("\u00f2", 8), ("\u00f3", 7), ("\u00fa", 9), ("\u00fc", 10)))
  val catalan_a1: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("la", 1), ("-la", 1), ("sela", 1), ("le", 1), ("me", 1), ("-me", 1), ("se", 1), ("-te", 1), ("hi", 1), ("'hi", 1), ("li", 1), ("-li", 1), ("'l", 1), ("'m", 1), ("-m", 1), ("'n", 1), ("-n", 1), ("ho", 1), ("'ho", 1), ("lo", 1), ("selo", 1), ("'s", 1), ("las", 1), ("selas", 1), ("les", 1), ("-les", 1), ("'ls", 1), ("-ls", 1), ("'ns", 1), ("-ns", 1), ("ens", 1), ("los", 1), ("selos", 1), ("nos", 1), ("-nos", 1), ("vos", 1), ("us", 1), ("-us", 1), ("'t", 1)))
  val catalan_a2: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("ica", 4), ("l\u00f3gica", 3), ("enca", 1), ("ada", 2), ("ancia", 1), ("encia", 1), ("\u00e8ncia", 1), ("\u00edcia", 1), ("logia", 3), ("inia", 1), ("\u00edinia", 1), ("eria", 1), ("\u00e0ria", 1), ("at\u00f2ria", 1), ("alla", 1), ("ella", 1), ("\u00edvola", 1), ("ima", 1), ("\u00edssima", 1), ("qu\u00edssima", 5), ("ana", 1), ("ina", 1), ("era", 1), ("sfera", 1), ("ora", 1), ("dora", 1), ("adora", 1), ("adura", 1), ("esa", 1), ("osa", 1), ("assa", 1), ("essa", 1), ("issa", 1), ("eta", 1), ("ita", 1), ("ota", 1), ("ista", 1), ("ialista", 1), ("ionista", 1), ("iva", 1), ("ativa", 1), ("n\u00e7a", 1), ("log\u00eda", 3), ("ic", 4), ("\u00edstic", 1), ("enc", 1), ("esc", 1), ("ud", 1), ("atge", 1), ("ble", 1), ("able", 1), ("ible", 1), ("isme", 1), ("ialisme", 1), ("ionisme", 1), ("ivisme", 1), ("aire", 1), ("icte", 1), ("iste", 1), ("ici", 1), ("\u00edci", 1), ("logi", 3), ("ari", 1), ("tori", 1), ("al", 1), ("il", 1), ("all", 1), ("ell", 1), ("\u00edvol", 1), ("isam", 1), ("issem", 1), ("\u00ecssem", 1), ("\u00edssem", 1), ("\u00edssim", 1), ("qu\u00edssim", 5), ("amen", 1), ("\u00ecssin", 1), ("ar", 1), ("ificar", 1), ("egar", 1), ("ejar", 1), ("itar", 1), ("itzar", 1), ("fer", 1), ("or", 1), ("dor", 1), ("dur", 1), ("doras", 1), ("ics", 4), ("l\u00f3gics", 3), ("uds", 1), ("nces", 1), ("ades", 2), ("ancies", 1), ("encies", 1), ("\u00e8ncies", 1), ("\u00edcies", 1), ("logies", 3), ("inies", 1), ("\u00ednies", 1), ("eries", 1), ("\u00e0ries", 1), ("at\u00f2ries", 1), ("bles", 1), ("ables", 1), ("ibles", 1), ("imes", 1), ("\u00edssimes", 1), ("qu\u00edssimes", 5), ("formes", 1), ("ismes", 1), ("ialismes", 1), ("ines", 1), ("eres", 1), ("ores", 1), ("dores", 1), ("idores", 1), ("dures", 1), ("eses", 1), ("oses", 1), ("asses", 1), ("ictes", 1), ("ites", 1), ("otes", 1), ("istes", 1), ("ialistes", 1), ("ionistes", 1), ("iques", 4), ("l\u00f3giques", 3), ("ives", 1), ("atives", 1), ("log\u00edes", 3), ("alleng\u00fces", 1), ("icis", 1), ("\u00edcis", 1), ("logis", 3), ("aris", 1), ("toris", 1), ("ls", 1), ("als", 1), ("ells", 1), ("ims", 1), ("\u00edssims", 1), ("qu\u00edssims", 5), ("ions", 1), ("cions", 1), ("acions", 2), ("esos", 1), ("osos", 1), ("assos", 1), ("issos", 1), ("ers", 1), ("ors", 1), ("dors", 1), ("adors", 1), ("idors", 1), ("ats", 1), ("itats", 1), ("bilitats", 1), ("ivitats", 1), ("ativitats", 1), ("\u00eftats", 1), ("ets", 1), ("ants", 1), ("ents", 1), ("ments", 1), ("aments", 1), ("ots", 1), ("uts", 1), ("ius", 1), ("trius", 1), ("atius", 1), ("\u00e8s", 1), ("\u00e9s", 1), ("\u00eds", 1), ("d\u00eds", 1), ("\u00f3s", 1), ("itat", 1), ("bilitat", 1), ("ivitat", 1), ("ativitat", 1), ("\u00eftat", 1), ("et", 1), ("ant", 1), ("ent", 1), ("ient", 1), ("ment", 1), ("ament", 1), ("isament", 1), ("ot", 1), ("isseu", 1), ("\u00ecsseu", 1), ("\u00edsseu", 1), ("triu", 1), ("\u00edssiu", 1), ("atiu", 1), ("\u00f3", 1), ("i\u00f3", 1), ("ci\u00f3", 1), ("aci\u00f3", 1)))
  val catalan_a3: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("aba", 1), ("esca", 1), ("isca", 1), ("\u00efsca", 1), ("ada", 1), ("ida", 1), ("uda", 1), ("\u00efda", 1), ("ia", 1), ("aria", 1), ("iria", 1), ("ara", 1), ("iera", 1), ("ira", 1), ("adora", 1), ("\u00efra", 1), ("ava", 1), ("ixa", 1), ("itza", 1), ("\u00eda", 1), ("ar\u00eda", 1), ("er\u00eda", 1), ("ir\u00eda", 1), ("\u00efa", 1), ("isc", 1), ("\u00efsc", 1), ("ad", 1), ("ed", 1), ("id", 1), ("ie", 1), ("re", 1), ("dre", 1), ("ase", 1), ("iese", 1), ("aste", 1), ("iste", 1), ("ii", 1), ("ini", 1), ("esqui", 1), ("eixi", 1), ("itzi", 1), ("am", 1), ("em", 1), ("arem", 1), ("irem", 1), ("\u00e0rem", 1), ("\u00edrem", 1), ("\u00e0ssem", 1), ("\u00e9ssem", 1), ("iguem", 1), ("\u00efguem", 1), ("avem", 1), ("\u00e0vem", 1), ("\u00e1vem", 1), ("ir\u00ecem", 1), ("\u00edem", 1), ("ar\u00edem", 1), ("ir\u00edem", 1), ("assim", 1), ("essim", 1), ("issim", 1), ("\u00e0ssim", 1), ("\u00e8ssim", 1), ("\u00e9ssim", 1), ("\u00edssim", 1), ("\u00efm", 1), ("an", 1), ("aban", 1), ("arian", 1), ("aran", 1), ("ieran", 1), ("iran", 1), ("\u00edan", 1), ("ar\u00edan", 1), ("er\u00edan", 1), ("ir\u00edan", 1), ("en", 1), ("ien", 1), ("arien", 1), ("irien", 1), ("aren", 1), ("eren", 1), ("iren", 1), ("\u00e0ren", 1), ("\u00efren", 1), ("asen", 1), ("iesen", 1), ("assen", 1), ("essen", 1), ("issen", 1), ("\u00e9ssen", 1), ("\u00efssen", 1), ("esquen", 1), ("isquen", 1), ("\u00efsquen", 1), ("aven", 1), ("ixen", 1), ("eixen", 1), ("\u00efxen", 1), ("\u00efen", 1), ("in", 1), ("inin", 1), ("sin", 1), ("isin", 1), ("assin", 1), ("essin", 1), ("issin", 1), ("\u00efssin", 1), ("esquin", 1), ("eixin", 1), ("aron", 1), ("ieron", 1), ("ar\u00e1n", 1), ("er\u00e1n", 1), ("ir\u00e1n", 1), ("i\u00efn", 1), ("ado", 1), ("ido", 1), ("ando", 2), ("iendo", 1), ("io", 1), ("ixo", 1), ("eixo", 1), ("\u00efxo", 1), ("itzo", 1), ("ar", 1), ("tzar", 1), ("er", 1), ("eixer", 1), ("ir", 1), ("ador", 1), ("as", 1), ("abas", 1), ("adas", 1), ("idas", 1), ("aras", 1), ("ieras", 1), ("\u00edas", 1), ("ar\u00edas", 1), ("er\u00edas", 1), ("ir\u00edas", 1), ("ids", 1), ("es", 1), ("ades", 1), ("ides", 1), ("udes", 1), ("\u00efdes", 1), ("atges", 1), ("ies", 1), ("aries", 1), ("iries", 1), ("ares", 1), ("ires", 1), ("adores", 1), ("\u00efres", 1), ("ases", 1), ("ieses", 1), ("asses", 1), ("esses", 1), ("isses", 1), ("\u00efsses", 1), ("ques", 1), ("esques", 1), ("\u00efsques", 1), ("aves", 1), ("ixes", 1), ("eixes", 1), ("\u00efxes", 1), ("\u00efes", 1), ("abais", 1), ("arais", 1), ("ierais", 1), ("\u00edais", 1), ("ar\u00edais", 1), ("er\u00edais", 1), ("ir\u00edais", 1), ("aseis", 1), ("ieseis", 1), ("asteis", 1), ("isteis", 1), ("inis", 1), ("sis", 1), ("isis", 1), ("assis", 1), ("essis", 1), ("issis", 1), ("\u00efssis", 1), ("esquis", 1), ("eixis", 1), ("itzis", 1), ("\u00e1is", 1), ("ar\u00e9is", 1), ("er\u00e9is", 1), ("ir\u00e9is", 1), ("ams", 1), ("ados", 1), ("idos", 1), ("amos", 1), ("\u00e1bamos", 1), ("\u00e1ramos", 1), ("i\u00e9ramos", 1), ("\u00edamos", 1), ("ar\u00edamos", 1), ("er\u00edamos", 1), ("ir\u00edamos", 1), ("aremos", 1), ("eremos", 1), ("iremos", 1), ("\u00e1semos", 1), ("i\u00e9semos", 1), ("imos", 1), ("adors", 1), ("ass", 1), ("erass", 1), ("ess", 1), ("ats", 1), ("its", 1), ("ents", 1), ("\u00e0s", 1), ("ar\u00e0s", 1), ("ir\u00e0s", 1), ("ar\u00e1s", 1), ("er\u00e1s", 1), ("ir\u00e1s", 1), ("\u00e9s", 1), ("ar\u00e9s", 1), ("\u00eds", 1), ("i\u00efs", 1), ("at", 1), ("it", 1), ("ant", 1), ("ent", 1), ("int", 1), ("ut", 1), ("\u00eft", 1), ("au", 1), ("erau", 1), ("ieu", 1), ("ineu", 1), ("areu", 1), ("ireu", 1), ("\u00e0reu", 1), ("\u00edreu", 1), ("asseu", 1), ("esseu", 1), ("eresseu", 1), ("\u00e0sseu", 1), ("\u00e9sseu", 1), ("igueu", 1), ("\u00efgueu", 1), ("\u00e0veu", 1), ("\u00e1veu", 1), ("itzeu", 1), ("\u00eceu", 1), ("ir\u00eceu", 1), ("\u00edeu", 1), ("ar\u00edeu", 1), ("ir\u00edeu", 1), ("assiu", 1), ("issiu", 1), ("\u00e0ssiu", 1), ("\u00e8ssiu", 1), ("\u00e9ssiu", 1), ("\u00edssiu", 1), ("\u00efu", 1), ("ix", 1), ("eix", 1), ("\u00efx", 1), ("itz", 1), ("i\u00e0", 1), ("ar\u00e0", 1), ("ir\u00e0", 1), ("itz\u00e0", 1), ("ar\u00e1", 1), ("er\u00e1", 1), ("ir\u00e1", 1), ("ir\u00e8", 1), ("ar\u00e9", 1), ("er\u00e9", 1), ("ir\u00e9", 1), ("\u00ed", 1), ("i\u00ef", 1), ("i\u00f3", 1)))
  val catalan_a4: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("a", 1), ("e", 1), ("i", 1), ("\u00efn", 1), ("o", 1), ("ir", 1), ("s", 1), ("is", 1), ("os", 1), ("\u00efs", 1), ("it", 1), ("eu", 1), ("iu", 1), ("iqu", 2), ("itz", 1), ("\u00e0", 1), ("\u00e1", 1), ("\u00e9", 1), ("\u00ec", 1), ("\u00ed", 1), ("\u00ef", 1), ("\u00f3", 1)))

  // ==== Irish tables ====
  val irish_a0: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("b'", 4), ("bh", 14), ("bhf", 9), ("bp", 11), ("ch", 15), ("d'", 2), ("d'fh", 3), ("dh", 16), ("dt", 13), ("fh", 17), ("gc", 7), ("gh", 18), ("h-", 1), ("m'", 4), ("mb", 6), ("mh", 19), ("n-", 1), ("nd", 8), ("ng", 10), ("ph", 20), ("sh", 5), ("t-", 1), ("th", 21), ("ts", 12)))
  val irish_a1: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("\u00edochta", 1), ("a\u00edochta", 1), ("ire", 2), ("aire", 2), ("abh", 1), ("eabh", 1), ("ibh", 1), ("aibh", 1), ("amh", 1), ("eamh", 1), ("imh", 1), ("aimh", 1), ("\u00edocht", 1), ("a\u00edocht", 1), ("ir\u00ed", 2), ("air\u00ed", 2)))
  val irish_a2: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("\u00f3ideacha", 6), ("patacha", 5), ("achta", 1), ("arcachta", 2), ("eachta", 1), ("grafa\u00edochta", 4), ("paite", 5), ("ach", 1), ("each", 1), ("\u00f3ideach", 6), ("gineach", 3), ("patach", 5), ("grafa\u00edoch", 4), ("pataigh", 5), ("\u00f3idigh", 6), ("acht\u00fail", 1), ("eacht\u00fail", 1), ("gineas", 3), ("ginis", 3), ("acht", 1), ("arcacht", 2), ("eacht", 1), ("grafa\u00edocht", 4), ("arcachta\u00ed", 2), ("grafa\u00edochta\u00ed", 4)))
  val irish_a3: Array[(String, Int)] = SnowballRegions.sortDesc(Seq(("imid", 1), ("aimid", 1), ("\u00edmid", 1), ("a\u00edmid", 1), ("adh", 2), ("eadh", 2), ("faidh", 1), ("fidh", 1), ("\u00e1il", 2), ("ain", 2), ("tear", 2), ("tar", 2)))

}

/** Armenian (reference: Tartarus/Snowball/Ext/ArmenianStemmer.cs).
  * Steps, all backward and limited to after the first vowel: ending
  * (R2-gated case endings), verb, adjective, noun — each a pure
  * longest-suffix delete. */
object SnowballArmenian {
  import SnowballRegions._
  import SnowballExtTables._
  private val Vowels = "\u0561\u0565\u0567\u0568\u056b\u0578\u0582\u0585".toSet
  private def isV(c: Char): Boolean = Vowels(c)

  def stem(word: String): String = {
    val n = word.length
    var i = 0
    while (i < n && !isV(word.charAt(i))) i += 1
    val pV = if (i >= n) n else i + 1
    val r1 = regionAfterVC(word, 0, isV)
    val p2 = regionAfterVC(word, r1, isV)
    var w = word
    def step(tbl: Array[(String, Int)], needR2: Boolean): Unit =
      amongB(w, pV, tbl).foreach { case (s, _) =>
        if (!needR2 || p2 <= w.length - s.length)
          w = w.substring(0, w.length - s.length)
      }
    step(armenian_a3, needR2 = true)  // case endings
    step(armenian_a1, needR2 = false) // verb
    step(armenian_a0, needR2 = false) // adjective
    step(armenian_a2, needR2 = false) // noun
    w
  }
}

/** Basque (reference: Tartarus/Snowball/Ext/BasqueStemmer.cs): RV is the
  * Romance definition; `repeat aditzak` then `repeat izenak` strip verb /
  * noun morphology until no suffix matches (threading the virtual end),
  * then one adjective pass. */
object SnowballBasque {
  import SnowballRegions._
  import SnowballExtTables._
  private def isV(c: Char): Boolean = "aeiou".indexOf(c) >= 0

  // code -> (condition: 0 none, 1 RV, 2 R1, 3 R2; replacement)
  private val aditzakActs = Map(1 -> (1, ""), 2 -> (3, ""), 3 -> (0, "atseden"),
    4 -> (0, "arabera"), 5 -> (0, "baditu"))
  private val izenakActs = Map(1 -> (1, ""), 2 -> (3, ""), 3 -> (0, "jok"),
    4 -> (2, ""), 5 -> (0, "tra"), 6 -> (0, "minutu"), 7 -> (0, "zehar"),
    8 -> (0, "geldi"), 9 -> (0, "igaro"), 10 -> (0, "aurka"))
  private val adjAct = Map(1 -> (1, ""), 2 -> (0, "z"))

  def stem(word: String): String = {
    val pV = romanceRV(word, isV)
    val r1 = regionAfterVC(word, 0, isV)
    val p2 = regionAfterVC(word, r1, isV)
    var w = word
    var end = w.length
    def condOk(c: Int, bra: Int): Boolean = c match {
      case 1 => pV <= bra; case 2 => r1 <= bra; case 3 => p2 <= bra; case _ => true
    }
    def tryStep(tbl: Array[(String, Int)], acts: Map[Int, (Int, String)]): Boolean =
      amongB(w.substring(0, end), 0, tbl) match {
        case Some((s, code)) =>
          val bra = end - s.length
          val (cond, repl) = acts(code)
          if (!condOk(cond, bra)) false
          else { w = w.substring(0, bra) + repl + w.substring(end); end = bra; true }
        case None => false
      }
    while (tryStep(basque_a0, aditzakActs)) ()
    while (tryStep(basque_a1, izenakActs)) ()
    tryStep(basque_a2, adjAct)
    w
  }
}

/** Catalan (reference: Tartarus/Snowball/Ext/CatalanStemmer.cs):
  * attached pronouns (R1), then standard suffixes OR verb suffixes, then
  * residual endings — each matched at the true current end — then a
  * forward cleaning pass folding accented vowels. */
object SnowballCatalan {
  import SnowballRegions._
  import SnowballExtTables._
  private val Vowels = "aeiou\u00e0\u00e1\u00e8\u00e9\u00ed\u00ef\u00f2\u00f3\u00fa\u00fc".toSet
  private def isV(c: Char): Boolean = Vowels(c)

  private val pronAct = Map(1 -> (2, ""))
  private val stdActs = Map(1 -> (2, ""), 2 -> (3, ""), 3 -> (3, "log"),
    4 -> (3, "ic"), 5 -> (2, "c"))
  private val verbActs = Map(1 -> (2, ""), 2 -> (3, ""))
  private val residActs = Map(1 -> (2, ""), 2 -> (2, "ic"))

  def stem(word: String): String = {
    val r1 = regionAfterVC(word, 0, isV)
    val p2 = regionAfterVC(word, r1, isV)
    var w = word
    def condOk(c: Int, bra: Int): Boolean = c match {
      case 2 => r1 <= bra; case 3 => p2 <= bra; case _ => true
    }
    def step(tbl: Array[(String, Int)], acts: Map[Int, (Int, String)]): Boolean =
      amongB(w, 0, tbl) match {
        case Some((s, code)) =>
          val bra = w.length - s.length
          val (cond, repl) = acts(code)
          if (!condOk(cond, bra)) false
          else { w = w.substring(0, bra) + repl; true }
        case None => false
      }
    step(catalan_a1, pronAct)
    if (!step(catalan_a2, stdActs)) step(catalan_a3, verbActs)
    step(catalan_a4, residActs)
    w.map {
      case '\u00e0' | '\u00e1' => 'a'
      case '\u00e8' | '\u00e9' => 'e'
      case '\u00ec' | '\u00ed' | '\u00ef' => 'i'
      case '\u00f2' | '\u00f3' => 'o'
      case '\u00fa' | '\u00fc' => 'u'
      case '\u00b7' => '.'
      case c => c
    }
  }
}

/** Irish (reference: Tartarus/Snowball/Ext/IrishStemmer.cs): undo the
  * initial mutations first (eclipsis/lenition prefix among, FORWARD
  * longest-prefix match), mark regions on the demutated word, then noun,
  * derivational and verb suffix steps. */
object SnowballIrish {
  import SnowballRegions._
  import SnowballExtTables._
  private val Vowels = "aeiou\u00e1\u00e9\u00ed\u00f3\u00fa".toSet
  private def isV(c: Char): Boolean = Vowels(c)

  private val prefixRepl = Map(1 -> "", 2 -> "", 3 -> "f", 4 -> "", 5 -> "s",
    6 -> "b", 7 -> "c", 8 -> "d", 9 -> "f", 10 -> "g", 11 -> "p", 12 -> "s",
    13 -> "t", 14 -> "b", 15 -> "c", 16 -> "d", 17 -> "f", 18 -> "g",
    19 -> "m", 20 -> "p", 21 -> "t")
  private val nounActs = Map(1 -> (2, ""), 2 -> (3, ""))
  private val derivActs = Map(1 -> (3, ""), 2 -> (0, "arc"), 3 -> (0, "gin"),
    4 -> (0, "graf"), 5 -> (0, "paite"), 6 -> (0, "\u00f3id"))
  private val verbActs = Map(1 -> (1, ""), 2 -> (2, ""))

  /** Longest listed PREFIX of `w` (the forward among at word start). */
  private def amongF(w: String, tbl: Array[(String, Int)]): Option[(String, Int)] = {
    var i = 0
    while (i < tbl.length) {
      if (w.startsWith(tbl(i)._1)) return Some(tbl(i))
      i += 1
    }
    None
  }

  def stem(word: String): String = {
    var w = word
    amongF(w, irish_a0).foreach { case (s, code) =>
      w = prefixRepl(code) + w.substring(s.length)
    }
    val n = w.length
    var i = 0
    while (i < n && !isV(w.charAt(i))) i += 1
    val pV = if (i >= n) n else i + 1
    val r1 = regionAfterVC(w, 0, isV)
    val p2 = regionAfterVC(w, r1, isV)
    def condOk(c: Int, bra: Int): Boolean = c match {
      case 1 => pV <= bra; case 2 => r1 <= bra; case 3 => p2 <= bra; case _ => true
    }
    def step(tbl: Array[(String, Int)], acts: Map[Int, (Int, String)]): Unit =
      amongB(w, 0, tbl).foreach { case (s, code) =>
        val bra = w.length - s.length
        val (cond, repl) = acts(code)
        if (condOk(cond, bra)) w = w.substring(0, bra) + repl
      }
    step(irish_a1, nounActs)
    step(irish_a2, derivActs)
    step(irish_a3, verbActs)
    w
  }
}
