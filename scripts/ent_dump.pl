#!/usr/bin/perl
# Entity-codec differential helper: JSON string in -> [decoded,
# encoded] out, using the built reference (REF_BLIB, default
# /tmp/refbuild/blib).
use strict;
use warnings;
my $blib = $ENV{REF_BLIB} || "/tmp/refbuild/blib";
use lib;
lib->import("$blib/lib", "$blib/arch");
require HTML::Entities;
HTML::Entities->import(qw(decode_entities encode_entities));
use JSON::PP;
my $json = JSON::PP->new->utf8(1)->allow_nonref(1);
while (my $line = <STDIN>) {
    chomp $line;
    next unless length $line;
    my $s = $json->decode($line);
    my $d = $s;
    decode_entities($d);
    my $e = encode_entities($s);
    print $json->encode([$d, $e]), "\n";
}
