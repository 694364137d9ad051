"""Unit tests for the pure per-record functions — the reference semantics
pinned as executable oracles (SURVEY.md §5.2 item 1/3)."""

from __future__ import annotations

from crawler_ai_ray.functions import classify, contacts
from crawler_ai_ray.functions import jobs as jobfns
from crawler_ai_ray.functions.htmltext import (
    extract_out_links,
    extract_text_crawldata,
    extract_text_jobdetail,
    parse_page,
    pick_job_title,
)
from crawler_ai_ray.oracle.extract_oracle import (
    oracle_text_crawldata,
    oracle_text_jobdetail,
)

HTML = """<!DOCTYPE html><html><head><title>Acme &amp; Co</title>
<meta name="description" content="We build">
<style>.x{color:red}</style><script>var jobs=[{"title":"Dev"}];</script></head>
<body><header><a href="/careers">Careers</a></header>
<nav><a href="/about">About</a></nav>
<h1>Welcome home</h1><h1>Senior Java Developer</h1>
<p>Join   our team!&nbsp;Apply now - contact hr@acme.com or 0912 345 678.</p>
<aside>sidebar junk</aside><noscript>enable js</noscript>
<footer>footer text</footer></body></html>"""


class TestTextExtraction:
    def test_jobdetail_excludes_decomposed_tags(self):
        text = extract_text_jobdetail(HTML)
        assert "Careers" not in text          # header dropped
        assert "About" not in text           # nav dropped
        assert "sidebar junk" not in text    # aside dropped
        assert "enable js" not in text       # noscript dropped
        assert "footer text" not in text
        assert "color:red" not in text       # style dropped
        assert "var jobs" not in text        # script dropped
        assert "Senior Java Developer" in text
        assert "Acme & Co" in text           # title text + entity decoding

    def test_whitespace_collapse_and_nbsp(self):
        text = extract_text_jobdetail(HTML)
        assert "Join our team! Apply now" in text  # \s+ → ' ' incl. NBSP

    def test_short_text_gated_to_empty(self):
        assert extract_text_jobdetail("<p>short</p>") == ""

    def test_truncation_at_5000(self):
        html = "<p>" + "word " * 3000 + "</p>"
        assert len(extract_text_jobdetail(html)) == 5000

    def test_crawldata_includes_script_and_style(self):
        text = extract_text_crawldata(HTML)
        assert "var jobs" in text
        assert "Careers" in text

    def test_engine_matches_oracle(self):
        assert extract_text_jobdetail(HTML) == oracle_text_jobdetail(HTML)
        assert extract_text_crawldata(HTML) == oracle_text_crawldata(HTML)

    def test_nested_excluded_tags(self):
        html = "<body><nav>n1<nav>n2</nav>n3</nav><p>%s</p></body>" % ("x" * 60)
        assert "n2" not in extract_text_jobdetail(html)
        assert extract_text_jobdetail(html) == oracle_text_jobdetail(html)

    def test_title_pick_skips_generic(self):
        facts = parse_page(HTML)
        assert pick_job_title(facts) == "Senior Java Developer"

    def test_out_links_scheme_filter_and_join(self):
        facts = parse_page(
            '<a href="mailto:x@y.z">m</a><a href="/jobs/1">j</a>'
            '<a href="tel:123">t</a><a href="https://other.com/a">o</a>'
            '<a href="/jobs/1">dup</a>'
        )
        links = extract_out_links(facts, "https://acme.com/base")
        assert links == ["https://acme.com/jobs/1", "https://other.com/a"]

    def test_anchor_pairs_hosts_text_collapse_and_dups(self):
        from crawler_ai_ray.functions.htmltext import extract_anchor_pairs

        facts = parse_page(
            '<a href="mailto:x@y.z">m</a>'
            '<a href="/jobs/1">  Open\n  Roles </a>'
            '<a href="https://other.com/a"><span>See</span> <b>all</b></a>'
            '<a href="/jobs/1">Open Roles</a>'       # dup kept: one vote each
            '<a href="https://other.com/b"></a>'      # empty text dropped
        )
        pairs = extract_anchor_pairs(facts, "https://acme.com/base")
        assert pairs == [
            ("acme.com", "Open Roles"),
            ("other.com", "See all"),
            ("acme.com", "Open Roles"),
        ]


class TestContacts:
    def test_emails_lowercased_validated(self):
        emails = contacts.extract_emails(
            "Write HR@Acme.COM or favicon@2x.png or x@ab.c or sales@acme.vn"
        )
        assert emails == ["hr@acme.com", "sales@acme.vn"]

    def test_email_blocklist(self):
        assert contacts.extract_emails("see image@site.png and a@b.gif") == []

    def test_phones_loose(self):
        phones = contacts.extract_phones_loose("call 0912345678 now")
        assert "0912345678" in phones

    def test_phones_vn_nbsp_separators(self):
        # NBSP + zero-width separated digits must still match (text.py:40-46)
        text = "Hotline: +84 91​2 345 678"
        assert contacts.extract_phones_vn(text) == ["0912345678"]

    def test_clean_phone(self):
        assert contacts.clean_phone("+84 912 345 678") == "0912345678"
        assert contacts.clean_phone("12345") is None


class TestClassify:
    def test_priority_buckets(self):
        assert classify.priority_for_link("/careers") == 100
        assert classify.priority_for_link("/tuyen-dung") == 100
        assert classify.priority_for_link("/about-us") == 80
        assert classify.priority_for_link("/blog/post") == 50
        assert classify.priority_for_link("/x/y") == 10

    def test_valid_link(self):
        d = "acme.com"
        assert classify.is_valid_link("/careers", d)
        assert not classify.is_valid_link("#top", d)
        assert not classify.is_valid_link("javascript:void(0)", d)
        assert not classify.is_valid_link("https://other.com/x", d)
        assert not classify.is_valid_link("/logo.png", d)
        assert not classify.is_valid_link("/privacy/", d)

    def test_homepage(self):
        assert classify.is_homepage("https://a.com/")
        assert classify.is_homepage("https://a.com/index.html")
        assert not classify.is_homepage("https://a.com/careers")
        assert not classify.is_homepage("https://a.com/?page=2")

    def test_career_listing(self):
        assert classify.is_career_listing_page("https://a.com/careers", "")
        assert classify.is_career_listing_page("https://careers.a.com/x", "")
        assert not classify.is_career_listing_page("https://a.com/", "")
        # job-detail indicator rejects
        assert not classify.is_career_listing_page(
            "https://a.com/career/senior-dev", ""
        )
        # content CTA accept
        assert classify.is_career_listing_page(
            "https://a.com/x", "<p>Apply now</p>"
        )

    def test_career_score(self):
        s = classify.career_page_score(
            "https://a.com/careers", "Tuyển dụng", "apply position vacancy"
        )
        # 0.4 (url) + 0.3 (title) + 0.1 (first content hit) then the
        # content loop breaks because score ≥ 0.6 (spider :540-543)
        assert abs(s - 0.8) < 1e-9
        assert classify.career_page_score("https://a.com/x", "t", "c") == 0.0

    def test_is_job_url(self):
        assert classify.is_job_url("https://a.com/jobs/java-dev-3")
        assert classify.is_job_url("https://careers.a.com/opening-1")
        assert classify.is_job_url("https://a.com/x/1234")        # numeric tail
        assert classify.is_job_url("https://a.com/p?id=77")       # query param
        assert not classify.is_job_url("https://a.com/careers")
        assert not classify.is_job_url("https://a.com/blog.pdf")
        assert not classify.is_job_url("javascript:void(0)")


class TestJobs:
    def test_is_job_title(self):
        assert jobfns.is_job_title("Senior Java Developer")
        assert not jobfns.is_job_title("Free lunch")       # benefit phrase
        assert not jobfns.is_job_title("Dev")              # < 5 chars
        assert not jobfns.is_job_title("Our great culture")

    def test_summarizer_sentence_cut(self):
        text = ("A sentence that ends here. " * 20).strip()
        s = jobfns.summarize_description(text, max_length=100)
        assert s.endswith(" ...")
        assert len(s) <= 105
        assert s[: s.rfind(" ...")].endswith(".")

    def test_summarizer_short_passthrough(self):
        assert jobfns.summarize_description("short text") == "short text"

    def test_job_type_normalization(self):
        assert jobfns.normalize_job_type("full time") == "Full-time"
        assert jobfns.normalize_job_type("temp") == "Contract"
        assert jobfns.normalize_job_type("student") == "Internship"
        assert jobfns.normalize_job_type("whatever") == "Full-time"

    def test_company_from_url(self):
        assert jobfns.extract_company_from_url("https://www.acme.com/x") == "Acme"
        assert jobfns.extract_company_from_url("https://biplus.com.vn/a") == "Biplus"

    def test_dedup_exact_first_wins(self):
        jobs = [
            {"title": "Java Developer", "company": "Acme", "tag": 1},
            {"title": "java developer", "company": "ACME", "tag": 2},
            {"title": "QA Tester", "company": "Acme", "tag": 3},
        ]
        out = jobfns.dedup_exact(jobs)
        assert [j["tag"] for j in out] == [1, 3]

    def test_fuzzy_titles_documented_asymmetry(self):
        # job_extraction_service.py:2176-2183: ≤1-word-diff subsets merge,
        # bigger suffixes do NOT ("Java Developer (định hướng lead team)")
        assert jobfns.are_titles_similar("java developer", "java developer senior")
        assert not jobfns.are_titles_similar(
            "java developer", "java developer (định hướng lead team)"
        )
        assert jobfns.are_titles_similar(
            "senior java backend developer", "java backend developer engineer"
        )

    def test_tables_lists_headings_extraction(self):
        facts = parse_page(
            "<table><tr><td>Java Developer</td><td>3 yrs</td><td>2</td></tr>"
            "<tr><td>nope</td></tr></table>"
            "<ul><li>Flutter Developer</li><li>Free lunch</li></ul>"
            "<h3>QA Tester wanted</h3>"
        )
        t = jobfns.extract_jobs_from_tables(facts)
        assert t[0]["title"] == "Java Developer"
        assert t[0]["description"] == "Experience: 3 yrs | Positions: 2"
        li = jobfns.extract_jobs_from_lists(facts)
        assert [j["title"] for j in li] == ["Flutter Developer"]
        h = jobfns.extract_jobs_from_headings(facts)
        assert [j["title"] for j in h] == ["QA Tester wanted"]

    def test_js_and_hidden_extraction(self):
        facts = parse_page(
            '<script>var d={jobs: [{"title": "Ops Manager", "type": "contract"}]};</script>'
            '<div style="display:none">Hidden QA Engineer</div>'
            '<div data-job=\'{"title": "Data Analyst", "location": "HN"}\'>x</div>'
        )
        js = jobfns.extract_jobs_from_scripts(facts)
        assert js[0]["title"] == "Ops Manager"
        assert js[0]["job_type"] == "Contract"
        hid = jobfns.extract_jobs_from_hidden(facts)
        titles = {j["title"] for j in hid}
        assert "Hidden QA Engineer" in titles
        assert "Data Analyst" in titles
