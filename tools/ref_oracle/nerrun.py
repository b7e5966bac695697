# Differential oracle for ner_pos_per_sentence with a mock client.
import sys, json, io, types
sys.path.insert(0, '/tmp/refh')
sys.path.insert(1, '/root/reference')
import main_ner

class MockClient:
    def __init__(self, tokens):
        self.tokens = tokens
    def annotate(self, sent):
        toks = [types.SimpleNamespace(word=t['word'], pos=t['pos'], ner=t['ner'],
                                      beginChar=t['beginChar'], endChar=t['endChar'])
                for t in self.tokens]
        return types.SimpleNamespace(sentence=[types.SimpleNamespace(token=toks)])

fixtures = json.load(open(sys.argv[1], encoding='utf8'))
results = []
real = sys.stdout; sys.stdout = io.StringIO()
for fx in fixtures:
    bucket = {}
    m, s, p, mis = main_ner.ner_pos_per_sentence(MockClient(fx['tokens']), fx['sent'],
                                                 ner_token_bucket=bucket,
                                                 total_count_special_token_misplaced_spans=0)
    results.append({'id': fx['id'], 'mentions': m, 'spans': s,
                    'pos': {k: sorted(v) for k, v in p.items()},
                    'bucket': bucket, 'misplaced': mis})
sys.stdout = real
json.dump(results, open(sys.argv[2], 'w', encoding='utf8'), ensure_ascii=False)
print(f"wrote {len(results)}")
