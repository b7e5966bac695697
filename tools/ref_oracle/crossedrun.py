# Differential oracle for the dormant ADD_HALF_COARSE "crossed" lists
# (dudepparse.py:1722,1774-1783). post_processing returns exactly the
# fine_res / amend_fine_res lists the flag-on branch would feed to
# coarsify, and coarsify is module-level — so the crossed outputs are
# reproduced faithfully without patching the reference source.
import sys, json, io
sys.path.insert(0, '/tmp/refh')
sys.path.insert(1, '/root/reference')
import dudepparse as dd
from extract import FineGrainedInfo, CoarseGrainedInfo


def run_sentence(parse, pos_tags):
    ddp_res = [{'word': parse['word'], 'head': parse['head'], 'deprel': parse['deprel']}]
    fine = [FineGrainedInfo(ddp_res[0]).parse()]
    ci = CoarseGrainedInfo(ddp_res[0])
    coarse = [ci.parse()]
    tn = dd.Token_Normalizer(remove_from_args=False)
    out = dd.post_processing(fine, coarse, ddp_res, [pos_tags], tn,
                             coarse_infos=[ci], KEEP_ONLY_SVO=True, DEBUG=False)
    fine_res, coarse_res, amend_fine = out[0], out[1], out[2]
    # the ADD_HALF_COARSE branch, verbatim (dudepparse.py:1775-1780)
    ac1 = dd.coarsify([ci], amend_fine, subj_flag=True, obj_flag=False, keep_same_flag=False)
    ac2 = dd.coarsify([ci], amend_fine, subj_flag=False, obj_flag=True, keep_same_flag=False)
    c1 = dd.coarsify([ci], fine_res, subj_flag=True, obj_flag=False, keep_same_flag=False)
    c2 = dd.coarsify([ci], fine_res, subj_flag=False, obj_flag=True, keep_same_flag=False)
    amend_crossed = [x + y for x, y in zip(ac1, ac2)]
    crossed = [x + y for x, y in zip(c1, c2)]

    def clean(lists):
        return [[[list(x[0]), x[1], list(x[2])] for x in sent] for sent in lists]
    return {'crossed': clean(crossed), 'amend_crossed': clean(amend_crossed)}


def main():
    fixtures = json.load(open(sys.argv[1], encoding='utf8'))
    results = []
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
