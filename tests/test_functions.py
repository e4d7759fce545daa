"""Direct tests for pandas-UDF stdlib functions (StringClean, domains,
experiments, IpNetwork) and the murmur3 implementation."""

import datetime

import pytest
from pyspark.sql import types as T

from osprey_spark.functions.experiments import murmur3_32, resolve_bucket
from tests.helpers import run_parity

TS = datetime.datetime(2024, 1, 1)


def test_murmur3_known_vectors():
    # public MurmurHash3 x86-32 test vectors
    assert murmur3_32(b"", 0) == 0
    assert murmur3_32(b"hello", 0) == 0x248BFA47
    assert murmur3_32(b"The quick brown fox jumps over the lazy dog", 0) == 0x2E4FF723
    assert murmur3_32(b"", 1) == 0x514E28B7


def test_resolve_bucket_properties():
    buckets = ["control", "treatment"]
    sizes = [50.0, 50.0]
    seen = set()
    for i in range(200):
        b = resolve_bucket("exp1", f"user_{i}", buckets, sizes)
        assert b in ("control", "treatment", "")
        seen.add(b)
    assert "control" in seen and "treatment" in seen
    # deterministic
    assert resolve_bucket("exp1", "user_1", buckets, sizes) == resolve_bucket(
        "exp1", "user_1", buckets, sizes
    )
    # partial rollout: 10%/10% → most users out of experiment
    outs = sum(
        1 for i in range(300) if resolve_bucket("e2", f"u{i}", buckets, [10.0, 10.0]) == ""
    )
    assert outs > 200


SCHEMA = T.StructType(
    [
        T.StructField("__row_id", T.LongType()),
        T.StructField("action_name", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("s", T.StringType()),
    ]
)


def _rows(values):
    return [dict(__row_id=i, action_name="e", ts=TS, s=v) for i, v in enumerate(values)]


def _run(spark, source, values):
    from osprey_spark.sml.compiler import RulesetCompiler

    df = spark.createDataFrame(
        [(r["__row_id"], r["action_name"], r["ts"], r["s"]) for r in _rows(values)], SCHEMA
    )
    plan = RulesetCompiler(
        {"main.sml": source}, input_schema=df.schema, action_name_col="action_name"
    ).compile()
    out = plan.apply(df, passthrough=["__row_id"]).orderBy("__row_id").collect()
    return [r.asDict(recursive=True) for r in out]


def test_string_clean(spark):
    src = """
S: str = JsonData(path='$.s')
Cleaned = StringClean(s=S, lower=True)
NoPunct = StringClean(s=S, remove_punctuation=True, lower=True)
NoSpace = StringClean(s=S, remove_space=True)
"""
    rows = _run(spark, src, ["He3llo   W0rld!", "café  X"])
    # l33t: 3→e; digits are NOT homoglyph-folded ('0' stays — reference
    # string.py:327-341 excludes digits/ascii letters from the table);
    # whitespace collapsed; lowered
    assert rows[0]["Cleaned"] == "heello w0rld!"
    assert rows[0]["NoPunct"] == "heello w0rld"
    assert rows[0]["NoSpace"] == "Heello" + "W0rld!"
    assert rows[1]["Cleaned"].startswith("caf")


def test_string_clean_reference_vectors(spark):
    """Normalization scenarios ported from the reference's own suite
    (stdlib/udfs/tests/test_strings.py:218-250): l33t folds, math
    alphanumerics, CJK/Greek/symbol homoglyphs, enclosed/circled/squared/
    negative/regional letter blocks."""
    src = """
S: str = JsonData(path='$.s')
C = StringClean(s=S, l33t=True, homoglyph=True, space=True,
                unicode_normalize=True, remove_emoji=True,
                remove_punctuation=True, lower=True)
"""
    cases = [
        ("🔞t3xt", "text"),
        ("∏opq", "nopq"),
        ("dat@ 2334", "data 2334"),
        ("t3xt |00-", "100"),
        ("𝐓𝐄𝐗𝐓", "text"),
        ("𝚃𝙴𝚇𝚃", "text"),
        ("tex刀", "texn"),
        ("te×ts", "texts"),
        ("texη", "texn"),
        ("plaϲeholder", "placeholder"),
        ("EXAMΡLE", "example"),
        ("ｄｒｏｉｄ", "droid"),
        ("🅳🆁🅾🅸🅳", "droid"),
        ("⒜,⒝,⒞,⒟", "a,b,c,d"),
        ("Ⓐ,Ⓑ,Ⓒ", "a,b,c"),
        ("🄰,🄱,🄲", "a,b,c"),
        ("🅐,🅑,🅒", "a,b,c"),
        ("🇦,🇧,🇨", "a,b,c"),
    ]
    rows = _run(spark, src, [s for s, _ in cases])
    for (s, expected), row in zip(cases, rows):
        got = row["C"]
        # commas are punctuation-stripped; compare letter content
        assert expected.replace(",", "") in got.replace(",", ""), (s, got)
        assert "|" not in got


def test_extract_urls_and_domains(spark):
    src = """
S: str = JsonData(path='$.s')
Domains = StringExtractDomains(s=S)
Urls = StringExtractURLs(s=S)
"""
    rows = _run(
        spark, src,
        ["go to https://a.example.com/x and http://b.org:8080/y now", "no links here"],
    )
    assert rows[0]["Domains"] == ["a.example.com", "b.org"]
    assert rows[0]["Urls"] == ["http://b.org:8080/y", "https://a.example.com/x"]
    assert rows[1]["Domains"] == []


def test_email_domain_and_tld(spark):
    src = """
S: str = JsonData(path='$.s')
Domain = EmailDomain(email=S)
Sub = EmailSubdomain(email=S)
Local = EmailLocalPart(email=S)
"""
    rows = _run(
        spark, src,
        ["bob@mail.example.co.uk", "alice@Example.COM", "not-an-email"],
    )
    assert rows[0]["Domain"] == "example.co.uk"
    assert rows[0]["Sub"] == "mail.example.co.uk"
    assert rows[0]["Local"] == "bob"
    assert rows[1]["Domain"] == "example.com"
    assert rows[2]["Domain"] is None and rows[2]["Local"] is None


def test_ip_network(spark):
    src = """
S: str = JsonData(path='$.s')
Net = IpNetwork(ip=S)
"""
    rows = _run(spark, src, ["192.168.12.34", "2001:0db8:0000:0000:0000:ff00:0042:8329"])
    assert rows[0]["Net"] == "192.168.12.0"
    assert rows[1]["Net"] == "2001:db8:0:0:0:ff00:42:8329"


def test_phone_country_and_prefix(spark):
    src = """
S: str = JsonData(path='$.s')
Country = PhoneCountry(number=S)
Prefix = PhonePrefix(number=S)
"""
    rows = _run(spark, src, ["+14155551234", "+447911123456"])
    assert rows[0]["Country"] == "US"
    assert rows[1]["Country"] == "GB"
    assert rows[0]["Prefix"] == "+1415555"


def test_experiment_bucketing(spark):
    src = """
UserId: Entity[str] = EntityJson(type='User', path='$.s')
MyExp = Experiment(
  entity=UserId,
  buckets=['control', 'treatment'],
  bucket_sizes=[50.0, 50.0],
  version=1,
  revision=0,
)
InTreatment = MyExp == 'treatment'
"""
    ids = [f"user_{i}" for i in range(20)]
    rows = _run(spark, src, ids)
    for r, uid in zip(rows, ids):
        expected = resolve_bucket("MyExp", uid, ["control", "treatment"], [50.0, 50.0])
        assert r["MyExp"] == expected
        assert r["InTreatment"] == (expected == "treatment")


def test_misc_stdlib_parity(spark):
    """Hashes, base64, parse-int, slices, buckets — Spark vs Python oracle."""
    src = """
S: Optional[str] = JsonData(path='$.s', required=False)
Md5 = HashMd5(s=S)
Sha = HashSha256(s=S)
B64 = Base64Encode(s=S)
RoundTrip = Base64Decode(s=B64)
N = ParseInt(value=S)
Len = StringLength(s=S)
Up = StringToUpper(s=S)
Sliced = StringSlice(s=S, start=1, end=3)
Stripped = StringStrip(s=S)
"""
    run_parity(
        spark,
        {"main.sml": src},
        _rows(["  42  ", "hello", None, "x", "123abc"]),
        SCHEMA,
        check_error_count=False,
    )
