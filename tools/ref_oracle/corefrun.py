# Differential oracle for the coref front-end: replays fixture documents
# through the reference's merge_texts + fetch_coref with a MOCK annotator
# (the chain prediction is model input; the algorithmic surface under test
# is chunking, sentence alignment, mention->span conversion and the
# substitution rewrite).
import sys, json, io, types
sys.path.insert(0, '/tmp/refh')
sys.path.insert(1, '/root/reference')
import main_ner

def build_ann(spec):
    sentences = []
    for toks in spec['sentences']:
        tokens = [types.SimpleNamespace(word=w) for w in toks]
        sentences.append(types.SimpleNamespace(token=tokens))
    chains = []
    for ch in spec['chains']:
        mentions = [types.SimpleNamespace(sentenceIndex=m[0], beginIndex=m[1], endIndex=m[2])
                    for m in ch['mentions']]
        chains.append(types.SimpleNamespace(mention=mentions, representative=ch['representative']))
    return types.SimpleNamespace(sentence=sentences, corefChain=chains)

class MockClient:
    def __init__(self, merged, anns):
        self.by_text = {}
        for text, spec in zip(merged, anns):
            self.by_text[text] = spec
    def annotate(self, text):
        spec = self.by_text.get(text, 'MISSING')
        if spec is None or spec == 'MISSING':
            raise RuntimeError('annotator failure (mock)')
        return build_ann(spec)

def main():
    fixtures = json.load(open(sys.argv[1], encoding='utf8'))
    results = []
    real = sys.stdout
    sys.stdout = io.StringIO()
    for fx in fixtures:
        merged, offsets = main_ner.merge_texts(fx['splitted'], fx['threshold'])
        merged_match = (merged == fx['merged'])
        client = MockClient(merged, fx['anns'])
        corefed, reps, failed, mismatched, overlap, nchains = main_ner.fetch_coref(
            merged, offsets, fx['splitted'], client, fx['id'], False, repeated=False)
        results.append({
            'id': fx['id'], 'merged_match': merged_match, 'merged': merged,
            'failed': bool(failed), 'mismatched': bool(mismatched),
            'overlap': overlap, 'nchains': nchains,
            'corefed': corefed})
    sys.stdout = real
    json.dump(results, open(sys.argv[2], 'w', encoding='utf8'), ensure_ascii=False)
    print(f"wrote {len(results)}")

if __name__ == '__main__':
    main()
