#!/usr/bin/perl
# TokeParser-level differential helper: for each JSON {"doc":...}
# line, run two deterministic extraction protocols with the reference
# HTML::TokeParser and emit their outputs as JSON.
# Protocol A: repeat { get_tag; get_trimmed_text } until EOF.
# Protocol B: repeat { get_phrase; get_tag } until EOF.
use strict; use warnings;
my $blib = $ENV{REF_BLIB} || "/tmp/refbuild/blib";
use lib; lib->import("$blib/lib", "$blib/arch", "/tmp/perl5lib");
require HTML::TokeParser;
use JSON::PP;
my $json = JSON::PP->new->utf8(1)->allow_nonref(1);
while (my $line = <STDIN>) {
    chomp $line; next unless length $line;
    my $doc = $json->decode($line)->{doc};
    my @a;
    my $p = HTML::TokeParser->new(\$doc);
    while (my $t = $p->get_tag) {
        my $txt = $p->get_trimmed_text;
        push @a, [$t->[0], $txt];
    }
    my @b;
    my $p2 = HTML::TokeParser->new(\$doc);
    while (1) {
        my $phrase = $p2->get_phrase;
        push @b, $phrase;
        my $t = $p2->get_tag or last;
        push @b, $t->[0];
    }
    print $json->encode([\@a, \@b]), "\n";
}
