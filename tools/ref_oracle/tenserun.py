# Differential oracle for the dormant tense/modal primitives
# (check_rel_pred_tense / check_rel_pred_modal are module-level in the
# reference and callable even though the conversion flags are off).
import sys, json, io
sys.path.insert(0, '/tmp/refh')
sys.path.insert(1, '/root/reference')
import dudepparse as dd

fixtures = json.load(open(sys.argv[1], encoding='utf8'))
out = []
real = sys.stdout; sys.stdout = io.StringIO()
for fx in fixtures[:5000]:
    p = fx['parse']
    sent_ddp = {'word': p['word'], 'head': p['head'], 'deprel': p['deprel']}
    tenses, modals = [], []
    for t in range(len(p['word'])):
        rel = ((None, p['word'][t], None), 'SVO', (None, t, None))
        tenses.append(dd.check_rel_pred_tense(rel, [], sent_ddp))
        modals.append(dd.check_rel_pred_modal(rel, [], sent_ddp))
    out.append({'id': fx['id'], 'tense': tenses, 'modal': modals})
sys.stdout = real
json.dump(out, open(sys.argv[2], 'w', encoding='utf8'), ensure_ascii=False)
print(f"wrote {len(out)}")
