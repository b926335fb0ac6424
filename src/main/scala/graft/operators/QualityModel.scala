package graft.operators

/** The repo's frozen quality-classifier artifact — a
  * [[QualityClassifier]] model trained ONCE (offline, by
  * `QualityClassifier.train`) and shipped as fixed-point literals, the
  * fastText/FineWeb-Edu "ship the model" pattern: training happens on a
  * labeled seed corpus, inference runs everywhere as pure integer
  * arithmetic against these constants (d51's cross-engine oracle gate
  * holds because the weights are data, not computation).
  *
  * Provenance: logistic regression over 512 hashed-bigram buckets
  * (md5-prefix hash, the d47 feature space), 200 full-batch epochs at
  * lr=6.0, L2=1e-4, on the sf0.01 documents fixture labeled by
  * function-word density (fraction of 'the'/'a' tokens >= 0.0611, the
  * corpus median) — the stopword-density quality signal of CCNet/Gopher
  * recast as a learned classifier; 83.4% train accuracy against a label
  * that mean-bag features only estimate noisily. Retraining (same
  * fixture, same hyperparameters) reproduces these weights up to
  * float-sum ordering; the FROZEN copy is the contract.
  */
object QualityModel {

  val buckets: Int = 512

  val bias1e4: Long = 64L

  val weights1e4: Seq[Long] = Seq(
    1514L, 1371L, 0L, 0L, 0L, 0L, -2441L, 516L, -156L, -1578L,
    -1043L, 0L, -106L, 0L, -81L, -227L, -154L, 3417L, 3189L, 5098L,
    3884L, -3726L, -2751L, -540L, -1779L, -958L, 4462L, 0L, -1313L, -2027L,
    -804L, -3988L, -3879L, -452L, 0L, 1239L, 0L, -2126L, 902L, 0L,
    953L, -1788L, 2310L, -646L, 1822L, -2927L, 1480L, -1719L, -1657L, 995L,
    -65L, 0L, 115L, 0L, -1425L, 5176L, -3221L, -1111L, -5617L, -846L,
    6242L, -525L, -540L, 8635L, 1308L, -4236L, 356L, -2216L, -261L, 2961L,
    -943L, -2642L, 1191L, -293L, -4216L, -61L, -2891L, 1397L, 0L, -1736L,
    1440L, 0L, -969L, 1569L, -1671L, 1958L, -1290L, 0L, -146L, 863L,
    0L, 0L, 0L, -761L, -407L, 0L, -1427L, 2077L, 195L, -3129L,
    0L, -2909L, -1741L, 0L, 1133L, 15L, 272L, -1441L, -1993L, -2187L,
    -2197L, 2491L, -1864L, 5325L, 0L, 1674L, 1595L, 946L, -1079L, 1464L,
    -918L, -324L, -732L, 4636L, 1646L, 529L, 1766L, 333L, -1442L, 629L,
    0L, 924L, -1861L, 0L, -3014L, -755L, 0L, 1396L, 47L, -1800L,
    -2327L, 222L, 3834L, 3305L, 0L, 29L, 0L, 0L, -522L, 120L,
    -7024L, 4659L, 0L, -4050L, 0L, -2249L, 252L, -2470L, 599L, 27L,
    -2186L, -1638L, -837L, 0L, 401L, 0L, -2890L, 0L, 199L, 0L,
    -851L, 1920L, 0L, -8000L, 978L, 710L, 3720L, -1286L, 3151L, -800L,
    -1805L, -4635L, 1922L, -2923L, -1645L, 264L, 258L, 948L, 1586L, 40L,
    2147L, -1808L, 2719L, 1572L, 0L, 2595L, 0L, 0L, 625L, -1106L,
    -866L, 0L, -1418L, -66L, -717L, 0L, -4367L, 5075L, 146L, 2109L,
    678L, 0L, -1167L, 1129L, 3422L, 909L, 7169L, 185L, 0L, 447L,
    0L, 0L, 198L, 0L, 1619L, 1386L, 2814L, -5830L, -1568L, 1513L,
    -710L, 1812L, 1227L, 2551L, 0L, 3325L, -1450L, 4753L, 2725L, -4045L,
    0L, -1401L, 894L, 0L, 2316L, -3467L, 2363L, -1052L, 3705L, -2059L,
    0L, -3410L, 810L, 0L, -1586L, -1893L, 0L, 1220L, 2950L, 0L,
    0L, 3341L, 2767L, 4247L, 2284L, -2685L, -5552L, -2108L, 2358L, 871L,
    -1948L, -113L, 0L, 1834L, -1256L, 2107L, -2558L, -1031L, -1710L, 8485L,
    1778L, -2761L, 528L, -3065L, -2963L, 0L, 0L, 0L, -520L, 4570L,
    0L, 4203L, -1863L, 880L, -1604L, 0L, 2135L, -1211L, -5531L, 0L,
    -3184L, 0L, 1744L, 0L, 1116L, 3158L, 188L, 696L, 0L, -4916L,
    -525L, -4055L, 0L, 1746L, 407L, 0L, -58L, 488L, -3473L, 0L,
    0L, 0L, 1151L, -1550L, 0L, 2001L, 1208L, -243L, 2741L, 611L,
    -3798L, -198L, -2066L, 2190L, 2963L, -638L, 1362L, -5209L, 0L, 1627L,
    2761L, -4172L, -1437L, -848L, -4485L, 917L, 1981L, 0L, -3491L, 867L,
    1356L, 4356L, 2306L, -2597L, -3668L, 0L, -2114L, -524L, 2779L, 0L,
    1773L, 2419L, -1687L, 4037L, -128L, 0L, 478L, 0L, -1421L, -1739L,
    944L, -75L, 1026L, 1245L, 0L, 334L, -7029L, 1266L, -2377L, 785L,
    664L, -1493L, -1371L, 0L, 1638L, -2056L, 748L, -1317L, 1868L, 2861L,
    -451L, 758L, 671L, -2087L, -120L, -388L, -1945L, -1580L, 0L, 551L,
    -3674L, 0L, 282L, -793L, 0L, 2388L, 2419L, -2459L, -1757L, 0L,
    1635L, -1748L, 0L, 1169L, -1194L, 2299L, 3907L, -275L, -4322L, -568L,
    576L, 900L, 1837L, -2274L, -1684L, -3597L, -1323L, -1450L, 0L, 32L,
    0L, 961L, -1042L, -926L, -3502L, -541L, 565L, 1142L, 3009L, 0L,
    4537L, -1639L, -2925L, -576L, 1847L, 8147L, 1146L, -984L, -1061L, 0L,
    -177L, 1586L, 760L, -5310L, -1685L, 0L, -1381L, -794L, 0L, -801L,
    0L, 126L, 2667L, 525L, 3650L, 1072L, 4556L, -2116L, 2363L, 1689L,
    -188L, -847L, 1792L, 0L, 0L, -1586L, 1828L, 2971L, -364L, 1044L,
    -327L, -4062L, -739L, 0L, 0L, -2172L, -3493L, 532L, -1308L, -233L,
    0L, 5492L, -4068L, 0L, 203L, 4466L, 1600L, 0L, -3708L, 76L,
    228L, -167L, -56L, -2759L, -731L, 3838L, -2747L, -1080L, 4262L, 269L,
    214L, 8670L)
}
