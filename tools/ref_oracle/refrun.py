# Differential-test oracle: runs the REFERENCE implementation on fixture
# parses (its own --ready_ddp mode) and dumps the five relation lists.
import sys, json, io
sys.path.insert(0, '/tmp/refh')
sys.path.insert(1, '/root/reference')
import dudepparse as dd
from extract import FineGrainedInfo, CoarseGrainedInfo

def run_sentence(parse, pos_tags):
    ddp_res = [ {'word': parse['word'], 'head': parse['head'], 'deprel': parse['deprel']} ]
    fine = [FineGrainedInfo(ddp_res[0]).parse()]
    ci = CoarseGrainedInfo(ddp_res[0])
    coarse = [ci.parse()]
    tn = dd.Token_Normalizer(remove_from_args=False)
    out = dd.post_processing(fine, coarse, ddp_res, [pos_tags], tn,
                             coarse_infos=[ci], KEEP_ONLY_SVO=True, DEBUG=False)
    fine_res, coarse_res, amend_fine, amend_coarse, crossed, amend_crossed, possible = out[:7]
    def clean(lists):
        return [[ [list(x[0]), x[1], list(x[2])] for x in sent ] for sent in lists]
    return {'fine': clean(fine_res), 'coarse': clean(coarse_res),
            'amend_fine': clean(amend_fine), 'amend_coarse': clean(amend_coarse),
            'possible': clean(possible)}

def main():
    fixtures = json.load(open(sys.argv[1], encoding='utf8'))
    results = []
    # silence the reference's debug prints
    real_stdout = sys.stdout
    sys.stdout = io.StringIO()
    for fx in fixtures:
        try:
            res = run_sentence(fx['parse'], fx.get('pos_tags'))
            res['id'] = fx['id']
            res['ok'] = True
        except Exception as e:
            res = {'id': fx['id'], 'ok': False, 'error': repr(e)}
        results.append(res)
    sys.stdout = real_stdout
    json.dump(results, open(sys.argv[2], 'w', encoding='utf8'), ensure_ascii=False, indent=1)
    print(f"wrote {len(results)} results")

if __name__ == '__main__':
    main()
