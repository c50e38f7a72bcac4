"""Generate golden fixtures by RUNNING the reference implementation.
Output: src/test/resources/goldens.json consumed by ScalaTest."""
import sys, json, math
sys.path.insert(0, '/root/repo/tools')
import refharness as r

app = r.load_app_enhanced()

# ---------- fixture inputs ----------
def revword(w): return w[::-1]
rev_doc = ' '.join(revword(w) for w in (
    "the model and the data are used for training the network with this "
    "method and the results show that the model can learn from data").split())
short_rev = ' '.join(revword(w) for w in
    "the model and the data are used for training the network with this method and the results show that".split())  # 19 words

paper = """Deep Learning for Knowledge Graph Construction at Web Scale
Jane Smith, John Doe, and Wei Chen
Stanford University
2024    doi: 10.1234/abc.5678

Abstract
We propose a Convolutional Neural Network and a Graph Attention Network for large-scale knowledge graph construction. Our CNN and GAT models use self-attention and pre-training. The state-of-the-art BLEU score improves. See Figure 3 for details.

Introduction
Knowledge graphs [12] are used widely [Smith et al. 2020]. Contact: jane.smith@stanford.edu. The CNN architecture and the CNN training follow Eq. 4 and Fig. 5 conventions. Naïve approaches fail on 你好 data with α=β noise.
Figure 1: Accuracy over epochs
Table 2: Dataset statistics
Source: internal benchmark

Methods
Our method uses Stochastic Gradient Descent and self-attention layers. Loss(x) = softmax(Wx + b). Equation (1): y = mx + c. The Graph Attention Network outperforms the CNN baseline. Self-attention and pre-training help. <b>bold claims</b> aside, the state-of-the-art results hold. SGD and GAT are compared. LSTM and BERT are baselines. THE AND FOR are not acronyms.

Results
The CNN model achieves 95.2% accuracy. Table 3 shows ablations. Figure 2: Loss curves over time. attention = softmax(QK/sqrt(d)) here. x = 2 * y holds. ∑ and α appear.

Discussion
Pre-training with self-attention is effective. The Convolutional Neural Network generalizes. However the Graph Attention Network wins.

Conclusion
We presented a scalable system. Future work includes multilingual KGs.
"""

cases = {
 "empty": "",
 "lower": "HELLO World",
 "email": "Contact test@example.com now",
 "email_unicode": "mail: jöhn.dóe@exämple.com end",
 "brackets": "text [with brackets] more [1,2] x[]y",
 "nested_brackets": "a [b [c] d] e",
 "caption_dead": "Some text Figure 1: Caption here more text",
 "table_dead": "Table 2: Stats here\nSource: xyz\nSee Figure 3 and Eq. 4 and Fig. 5 and Table. 6",
 "nonascii": "Ünïcode naïve 你好 α=β test",
 "istanbul": "İstanbul ŞĞ",
 "html": "a <b>bold</b> move <div class='x'>y</div>",
 "ws": "Multiple    spaces\nand\ttabs\x0b\x0c\x1c\x1d\x1e\x1f end",
 "reversed_trigger": rev_doc,
 "reversed_short": short_rev,
 "mixed": "The CNN [1] e-mail: a@b.c <i>it</i> Figure 9: nope 你好  x",
 "paper": paper,
 "only_ws": "   \n\t  ",
 "dots_email": "a.b-c@d.e rest",
 "at_only": "not@an email@ x @y",
 "astral": "emoji \U0001F600 pair \U0001D400x done",
 "nbsp": "a b c d",
 "long_word": "x"*2000 + " tail",
}
goldens = {"clean_text": {k: r.tp.clean_text(v) for k, v in cases.items()}}

# chunking: process() path and raw create_chunks with metadata
chunk_inputs = {
 "packing": ("word " * 700).strip(),
 "paper_raw": paper,
 "paper_cleaned": r.tp.clean_text(paper),
 "exact_1500": ' '.join(['abcdefghi']*150),  # 10*150=1500
 "headers": "intro text\nAbstract\nabstract body here\nIntroduction\nintro body\nMethods\nmore words",
 "headers_tight": "\nAbstract\n\nIntroduction\nbody",
 "empty": "",
 "one_word": "hello",
}
goldens["chunks"] = {}
for k, v in chunk_inputs.items():
    chs = r.tp.create_chunks(v, return_metadata=True)
    goldens["chunks"][k] = {
        "input": v,
        "chunks": [{"content": c.content, "start": c.start_offset,
                    "end": c.end_offset, "section": c.section} for c in chs]}
goldens["process"] = {k: r.tp.process(v) for k, v in chunk_inputs.items()}

# stats
goldens["text_stats"] = {k: r.tp.get_stats(v) for k, v in chunk_inputs.items() if v}

# document analyzer
da_inputs = {"paper": paper, "paper_cleaned": r.tp.clean_text(paper),
             "reversed": rev_doc, "small": "Tiny text. Nothing here."}
goldens["doc_stats"] = {k: r.da._compute_stats(v) for k, v in da_inputs.items()}
goldens["keywords"] = {k: r.da._extract_keywords(v) for k, v in da_inputs.items()}
goldens["summary"] = {k: r.da._extract_summary(v) for k, v in da_inputs.items()}
goldens["questions"] = {k: r.da._generate_suggested_questions(v, r.da._extract_keywords(v)) for k, v in da_inputs.items()}
goldens["analyzer_fix_reversed"] = {k: r.da._fix_reversed_text(v) for k, v in {**cases, **da_inputs}.items()}

# paper analyzer
goldens["figures"] = {}
goldens["terms"] = {}
for k, v in da_inputs.items():
    figs = r.pa._extract_figure_references(v)
    goldens["figures"][k] = [{"type": f.type, "title": f.title,
                              "caption": f.caption, "page": f.page} for f in figs]
    terms = r.pa._extract_technical_terms(v)
    goldens["terms"][k] = [{"term": t.term, "frequency": t.frequency,
                            "context": t.context} for t in terms]

# app_enhanced extractors
goldens["metadata"] = {k: app.extract_paper_metadata(v) for k, v in da_inputs.items()}
goldens["sections"] = {k: app.extract_sections(v) for k, v in da_inputs.items()}
goldens["equations"] = {k: app.extract_equations_from_text(v) for k, v in da_inputs.items()}

with open('/root/repo/src/test/resources/goldens.json', 'w') as f:
    json.dump(goldens, f, ensure_ascii=False, indent=1)
print("cases:", {k: len(v) for k, v in goldens.items()})

# ---------- fuzz corpus: random adversarial docs, reference-computed ----------
import random
rnd = random.Random(20260816)
frag = ["Loss(x)", "= softmax(Wx + b)", "x = 2 * y", "a=b", "Eq. 3", "Equation (4): z = q",
        "(5)", "word", "The Model", "CNN", "α", "∑", "naïve", "a@b.c", "[12]", "<b>x</b>",
        "Figure 7: cap", "=", "==", "f(x)=g(y)", "A(b)=c,d.", "self-attention", "Abstract",
        "\n", "\t", "  ", ".", "!?", "softmax", "Wx", "(", ")", "x1=2+y", "K = min(a)",
        "İ", "ẞ", "你", "\x0b", "e=exp(k)", "ReLU(z) = max(0,z)", "10.1234/x.1"]
fuzz = {}
for i in range(250):
    n = rnd.randint(1, 60)
    doc = ' '.join(rnd.choice(frag) for _ in range(n))
    fuzz[f"f{i}"] = {
        "input": doc,
        "clean": r.tp.clean_text(doc),
        "equations": app.extract_equations_from_text(doc),
        "terms": [(t.term, t.frequency) for t in r.pa._extract_technical_terms(doc)],
        "keywords": r.da._extract_keywords(doc),
        "chunks": r.tp.process(doc),
    }
goldens["fuzz"] = fuzz
with open('/root/repo/src/test/resources/goldens.json', 'w') as f:
    json.dump(goldens, f, ensure_ascii=False, indent=1)
print("fuzz cases:", len(fuzz))
