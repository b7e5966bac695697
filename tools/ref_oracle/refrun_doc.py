# Document-level differential oracle: processes MULTI-SENTENCE documents
# through the reference post_processing exactly as its main loop does
# (dudepparse.py:1908-1951), validating that the engine's per-sentence
# decomposition is equivalent.
import sys, json, io
sys.path.insert(0, '/tmp/refh')
sys.path.insert(1, '/root/reference')
import dudepparse as dd
from extract import FineGrainedInfo, CoarseGrainedInfo

def run_doc(parses, pos_tags_list):
    ddp_res = [ {'word': p['word'], 'head': p['head'], 'deprel': p['deprel']} for p in parses ]
    fine, coarse, infos = [], [], []
    for r in ddp_res:
        fine.append(FineGrainedInfo(r).parse())
        ci = CoarseGrainedInfo(r)
        infos.append(ci)
        coarse.append(ci.parse())
    tn = dd.Token_Normalizer(remove_from_args=False)
    out = dd.post_processing(fine, coarse, ddp_res, pos_tags_list, tn,
                             coarse_infos=infos, KEEP_ONLY_SVO=True, DEBUG=False)
    f, c, af, ac, crossed, across, poss = out[:7]
    def clean(lists):
        return [[ [list(x[0]), x[1], list(x[2])] for x in sent ] for sent in lists]
    return {'fine': clean(f), 'coarse': clean(c), 'amend_fine': clean(af),
            'amend_coarse': clean(ac), 'possible': clean(poss)}

def main():
    fixtures = json.load(open(sys.argv[1], encoding='utf8'))
    group = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    results = []
    real_stdout = sys.stdout
    sys.stdout = io.StringIO()
    for gi in range(0, len(fixtures), group):
        doc = fixtures[gi:gi+group]
        try:
            res = run_doc([fx['parse'] for fx in doc], [fx.get('pos_tags') for fx in doc])
            res['ids'] = [fx['id'] for fx in doc]
            res['ok'] = True
        except Exception as e:
            res = {'ids': [fx['id'] for fx in doc], 'ok': False, 'error': repr(e)}
        results.append(res)
    sys.stdout = real_stdout
    json.dump(results, open(sys.argv[2], 'w', encoding='utf8'), ensure_ascii=False)
    print(f"wrote {len(results)} docs")

if __name__ == '__main__':
    main()
